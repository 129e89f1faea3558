"""Torch checkpoint → flax parameter conversion.

Capability match for the reference's pretrained-weight loading
(/root/reference/mamba/mamba_ssm/utils/hf.py:9-23 `from_pretrained` and the
suite's model-zoo .pt loading). Maps the torch `state_dict` layouts of the
reference modules onto this framework's parameter trees so published
checkpoints port over (SURVEY.md §7 hard part f).

Covered layouts:
  * upstream causal `MambaLMHeadModel` (mixer_seq_simple.py) → MambaLMHeadModel
  * `mamba_simple.Mamba` bimamba-v2 (ViM) → MambaVim
  * `mamba_new.Mamba` DBM → MambaDBM
  * avion `TimeMamba` tower (timemamba.py:180-434) → TimeMamba
  * avion/action-recognition `ViViM`/`VisionMamba` (vimamba.py:231-489,
    vivim.py:229-502) → ViViM
  * avion `CLIP` dual encoder + `TextTransformer`
    (model_clip.py:46-105, transformer.py:390-418) → CLIP
  * positional/temporal-embedding inflation on frame-count or
    resolution change (avion/models/utils.py:224-300,
    main_lavila_finetune_mir.py:145-149)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor / array → numpy."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def convert_mamba_mixer(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """One causal Mamba mixer (mamba_simple/upstream layout) → our
    {in_proj, fwd{…}, out_proj} tree. Weight convention: torch Linear is
    (out, in); ours is (in, out) → transpose. Conv1d (d, 1, W) → (W, d)."""

    def g(name):
        return _t(sd[prefix + name])

    out = {
        "in_proj": {"kernel": g("in_proj.weight").T},
        "fwd": {
            "conv_w": g("conv1d.weight")[:, 0, :].T,
            "x_proj": g("x_proj.weight").T,
            "dt_proj": g("dt_proj.weight").T,
            "dt_bias": g("dt_proj.bias"),
            "A_log": g("A_log"),
            "D": g("D"),
        },
        "out_proj": {"kernel": g("out_proj.weight").T},
    }
    if prefix + "conv1d.bias" in sd:
        out["fwd"]["conv_bias"] = g("conv1d.bias")
    if prefix + "in_proj.bias" in sd:
        out["in_proj"]["bias"] = g("in_proj.bias")
    if prefix + "out_proj.bias" in sd:
        out["out_proj"]["bias"] = g("out_proj.bias")
    return out


def convert_vim_mixer(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Bimamba-v2 Mamba (mamba_simple.py:34-378, mirrored *_b params) →
    our MambaVim {in_proj, fwd, bwd, out_proj}."""
    out = convert_mamba_mixer(sd, prefix)

    def g(name):
        return _t(sd[prefix + name])

    bwd = {
        "conv_w": g("conv1d_b.weight")[:, 0, :].T,
        "x_proj": g("x_proj_b.weight").T,
        "dt_proj": g("dt_proj_b.weight").T,
        "dt_bias": g("dt_proj_b.bias"),
        "A_log": g("A_b_log"),
        "D": g("D_b"),
    }
    if prefix + "conv1d_b.bias" in sd:
        bwd["conv_bias"] = g("conv1d_b.bias")
    out["bwd"] = bwd
    return out


def convert_scan_norm_mixer(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Scan-norm ViM (mamba_simple_scan_norm.py:155,263-292 — RMSNorm(d_inner)
    on the direction sum replacing the /2) → our MambaScanNorm."""
    out = convert_vim_mixer(sd, prefix)
    out["scan_norm_w"] = _t(sd[prefix + "norm.weight"])
    return out


def convert_mamba_lm(sd: Dict[str, Any], n_layer: int) -> Dict[str, Any]:
    """Upstream MambaLMHeadModel state_dict → our MambaLMHeadModel params
    (tied lm head; rms norms)."""
    backbone: Dict[str, Any] = {
        "embedding": {"embedding": _t(sd["backbone.embedding.weight"])},
        "norm_f_w": _t(sd["backbone.norm_f.weight"]),
    }
    for i in range(n_layer):
        p = f"backbone.layers.{i}."
        backbone[f"layers_{i}"] = {
            "norm_w": _t(sd[p + "norm.weight"]),
            "mixer": convert_mamba_mixer(sd, p + "mixer."),
        }
    return {"params": {"backbone": backbone}}


def convert_dbm_mixer(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """DBM Mamba (mamba_new.py:34-317: one in_proj emitting two (x,z) pairs,
    shared conv/x_proj/dt_proj/A/D for both directions) → our MambaDBM
    {in_proj, shared{…}, out_proj}."""

    def g(name):
        return _t(sd[prefix + name])

    out = {
        "in_proj": {"kernel": g("in_proj.weight").T},
        "shared": {
            "conv_w": g("conv1d.weight")[:, 0, :].T,
            "x_proj": g("x_proj.weight").T,
            "dt_proj": g("dt_proj.weight").T,
            "dt_bias": g("dt_proj.bias"),
            "A_log": g("A_log"),
            "D": g("D"),
        },
        "out_proj": {"kernel": g("out_proj.weight").T},
    }
    if prefix + "conv1d.bias" in sd:
        out["shared"]["conv_bias"] = g("conv1d.bias")
    if prefix + "in_proj.bias" in sd:
        out["in_proj"]["bias"] = g("in_proj.bias")
    if prefix + "out_proj.bias" in sd:
        out["out_proj"]["bias"] = g("out_proj.bias")
    return out


def convert_layernorm(sd, prefix: str) -> Dict[str, Any]:
    out = {"scale": _t(sd[prefix + "weight"])}
    if prefix + "bias" in sd:
        out["bias"] = _t(sd[prefix + "bias"])
    return out


def convert_attention(sd, prefix: str, num_heads: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention → FusedMHA (models/common.py).

    torch packs q/k/v as in_proj_weight (3D, D) rows in [q; k; v] order —
    exactly FusedMHA's fused qkv kernel transposed to (in, out). num_heads
    is accepted for call-site symmetry (the fused layout is head-agnostic).
    """
    del num_heads
    w = _t(sd[prefix + "in_proj_weight"])          # (3D, D)
    out = {"qkv": {"kernel": w.T}, "out": {}}
    if prefix + "in_proj_bias" in sd:
        out["qkv"]["bias"] = _t(sd[prefix + "in_proj_bias"])
    out_w = _t(sd[prefix + "out_proj.weight"])      # (D, D)
    out["out"]["kernel"] = out_w.T
    if prefix + "out_proj.bias" in sd:
        out["out"]["bias"] = _t(sd[prefix + "out_proj.bias"])
    return out


def convert_mlp(sd, prefix: str, fc1: str = "fc1", fc2: str = "fc2"):
    out = {
        "fc1": {"kernel": _t(sd[prefix + fc1 + ".weight"]).T},
        "fc2": {"kernel": _t(sd[prefix + fc2 + ".weight"]).T},
    }
    if prefix + fc1 + ".bias" in sd:
        out["fc1"]["bias"] = _t(sd[prefix + fc1 + ".bias"])
    if prefix + fc2 + ".bias" in sd:
        out["fc2"]["bias"] = _t(sd[prefix + fc2 + ".bias"])
    return out


def convert_timemamba(sd: Dict[str, Any], depth: int, num_heads: int,
                      prefix: str = "") -> Dict[str, Any]:
    """avion TimeMamba tower state dict → our TimeMamba params (unrolled
    block layout; use `stack_block_params` for scan_blocks=True models).

    Key map (timemamba.py:235-275 + SpaceTimeBlock :98-127):
    patch_embed.proj (conv D,3,p,p → p,p,3,D), cls_token, pos_embed, ln_pre,
    blocks.{i}.{norm3, time_mamba(ViM), norm1, attn(MHA), norm2, mlp},
    norm, image_projection. NB the spatial attention weights map 1:1 to the
    flash-attention (batch-first) semantics the reference trains with."""

    def g(name):
        return _t(sd[prefix + name])

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0)
        },
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "norm": convert_layernorm(sd, prefix + "norm."),
    }
    if prefix + "patch_embed.proj.bias" in sd:
        params["patch_embed"]["bias"] = g("patch_embed.proj.bias")
    if prefix + "ln_pre.weight" in sd:
        params["ln_pre"] = convert_layernorm(sd, prefix + "ln_pre.")
    if prefix + "image_projection" in sd:
        params["image_projection"] = g("image_projection")
    for i in range(depth):
        bp = f"{prefix}blocks.{i}."
        blk = {
            "norm1": convert_layernorm(sd, bp + "norm1."),
            "norm2": convert_layernorm(sd, bp + "norm2."),
            "norm3": convert_layernorm(sd, bp + "norm3."),
            "attn": convert_attention(sd, bp + "attn.", num_heads),
            "mlp": convert_mlp(sd, bp + "mlp."),
            "time_mamba": convert_vim_mixer(sd, bp + "time_mamba."),
        }
        if bp + "alpha_timeattn" in sd:
            blk["alpha_timeattn"] = g("blocks.%d.alpha_timeattn" % i)
        params[f"block{i}"] = blk
    return params


def convert_vivim(sd: Dict[str, Any], depth: int, prefix: str = ""
                  ) -> Dict[str, Any]:
    """ViViM/VisionMamba state dict (vimamba.py:290-370 / vivim.py:229-502)
    → our ViViM params: patch_embed.proj, cls_token, pos_embed,
    temporal_embedding, layers.{i}.{norm, mixer(ViM)}, norm_f, head /
    image_projection."""

    def g(name):
        return _t(sd[prefix + name])

    params: Dict[str, Any] = {
        "patch_embed": {
            "proj": {
                "kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            }
        },
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
    }
    if prefix + "patch_embed.proj.bias" in sd:
        params["patch_embed"]["proj"]["bias"] = g("patch_embed.proj.bias")
    # the reference stores (num_frames, 1, D) — ours matches
    for k in ("temporal_embedding", "temporal_embed"):
        if prefix + k in sd:
            te = g(k)
            params["temporal_embed"] = te.reshape(te.shape[0], 1, te.shape[-1])
            break
    for i in range(depth):
        lp = f"{prefix}layers.{i}."
        params[f"norm{i}_w"] = _t(sd[lp + "norm.weight"])
        if lp + "norm.bias" in sd:
            params[f"norm{i}_b"] = _t(sd[lp + "norm.bias"])
        params[f"mixer{i}"] = convert_vim_mixer(sd, lp + "mixer.")
    params["norm_f_w"] = g("norm_f.weight")
    if prefix + "norm_f.bias" in sd:
        params["norm_f_b"] = g("norm_f.bias")
    if prefix + "head.weight" in sd:
        params["head"] = {"kernel": g("head.weight").T,
                          "bias": g("head.bias")}
    if prefix + "image_projection" in sd:
        params["image_projection"] = g("image_projection")
    return params


def convert_text_transformer(sd: Dict[str, Any], layers: int, num_heads: int,
                             prefix: str = "textual.") -> Dict[str, Any]:
    """avion TextTransformer (transformer.py:390-418, open_clip layout) →
    our TextTransformer params."""

    def g(name):
        return _t(sd[prefix + name])

    params: Dict[str, Any] = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "positional_embedding": g("positional_embedding"),
        "ln_final": convert_layernorm(sd, prefix + "ln_final."),
    }
    if prefix + "text_projection" in sd:
        params["text_projection"] = g("text_projection")
    for i in range(layers):
        bp = f"{prefix}transformer.resblocks.{i}."
        params[f"resblock{i}"] = {
            "ln_1": convert_layernorm(sd, bp + "ln_1."),
            "ln_2": convert_layernorm(sd, bp + "ln_2."),
            "attn": convert_attention(sd, bp + "attn.", num_heads),
            "mlp": convert_mlp(sd, bp + "mlp.", fc1="c_fc", fc2="c_proj"),
        }
    return params


def convert_clip_image_tower(sd: Dict[str, Any], layers: int, num_heads: int,
                             prefix: str = "visual.") -> Dict[str, Any]:
    """Published CLIP ViT image encoder (open_clip/`clip` layout — the
    frozen extractor of the reference VTG demo,
    run_on_video/clip_feature_extractor.py ViT-B/32) → ClipImageTower."""

    def g(name):
        return _t(sd[prefix + name])

    params: Dict[str, Any] = {
        # torch conv (out, in, kh, kw) → flax (kh, kw, in, out)
        "conv1": {"kernel": g("conv1.weight").transpose(2, 3, 1, 0)},
        "class_embedding": g("class_embedding"),
        "positional_embedding": g("positional_embedding"),
        "ln_pre": convert_layernorm(sd, prefix + "ln_pre."),
        "ln_post": convert_layernorm(sd, prefix + "ln_post."),
    }
    if prefix + "proj" in sd:
        params["proj"] = g("proj")
    for i in range(layers):
        bp = f"{prefix}transformer.resblocks.{i}."
        params[f"resblock{i}"] = {
            "ln_1": convert_layernorm(sd, bp + "ln_1."),
            "ln_2": convert_layernorm(sd, bp + "ln_2."),
            "attn": convert_attention(sd, bp + "attn.", num_heads),
            "mlp": convert_mlp(sd, bp + "mlp.", fc1="c_fc", fc2="c_proj"),
        }
    return params


def convert_clip(sd: Dict[str, Any], vision: str, vision_depth: int,
                 text_layers: int, text_heads: int,
                 vision_heads: int = 12) -> Dict[str, Any]:
    """avion CLIP (model_clip.py:46-105) → our CLIP params.

    vision: 'timemamba' | 'vivim'. The towers own their image_projection
    (builders pass output_dim into the tower, model_clip.py:721+)."""
    if vision == "timemamba":
        visual = convert_timemamba(sd, vision_depth, vision_heads,
                                   prefix="visual.")
    elif vision == "vivim":
        visual = convert_vivim(sd, vision_depth, prefix="visual.")
    else:
        raise ValueError(vision)
    params = {
        "visual": visual,
        "textual": convert_text_transformer(sd, text_layers, text_heads),
        "logit_scale": _t(sd["logit_scale"]).reshape(()),
    }
    return {"params": params}


def _interp_rows(x: np.ndarray, new_len: int) -> np.ndarray:
    """Linear interpolation along axis 0 (torch F.interpolate bilinear on a
    (1,1,T,D) image reduces to 1-D linear over T with align_corners=False)."""
    old_len = x.shape[0]
    if old_len == new_len:
        return x
    # align_corners=False sample positions
    pos = (np.arange(new_len) + 0.5) * old_len / new_len - 0.5
    pos = np.clip(pos, 0, old_len - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, old_len - 1)
    w = (pos - lo)[:, None]
    return (1 - w) * x[lo] + w * x[hi]


def inflate_temporal_embed(embed: np.ndarray, num_frames: int,
                           mode: str = "bilinear") -> np.ndarray:
    """Temporal-embedding inflation on frame-count change
    (avion/models/utils.py:224-300, used by main_lavila_finetune_mir.py:145).

    embed: (T_old, 1, D) or (T_old, D). MORE frames loaded → truncate;
    FEWER → interpolate ('bilinear'/'interp') or zero-pad ('zeros')."""
    squeeze = embed.ndim == 3
    e = embed[:, 0] if squeeze else embed
    t_old, d = e.shape
    if t_old == num_frames:
        out = e
    elif t_old > num_frames:
        out = e[:num_frames]
    elif mode == "zeros":
        out = np.concatenate([e, np.zeros((num_frames - t_old, d), e.dtype)])
    elif mode in ("interp", "bilinear"):
        out = _interp_rows(e, num_frames).astype(e.dtype)
    else:
        raise NotImplementedError(mode)
    return out[:, None] if squeeze else out


def inflate_pos_embed(pos: np.ndarray, new_num_patches: int) -> np.ndarray:
    """Spatial positional-embedding inflation on resolution change: keep the
    cls slot, bilinearly resize the patch grid (timm/avion convention).

    pos: (1, 1 + n_old, D) with a square n_old grid."""
    cls_tok, grid = pos[:, :1], pos[0, 1:]
    n_old, d = grid.shape
    side_old = int(round(n_old ** 0.5))
    side_new = int(round(new_num_patches ** 0.5))
    if side_old * side_old != n_old or side_new * side_new != new_num_patches:
        raise ValueError("pos-embed inflation needs square grids")
    if side_old == side_new:
        return pos
    g = grid.reshape(side_old, side_old, d)
    g = _interp_rows(g.reshape(side_old, side_old * d), side_new)
    g = g.reshape(side_new, side_old, d).transpose(1, 0, 2)
    g = _interp_rows(g.reshape(side_old, side_new * d), side_new)
    g = g.reshape(side_new, side_new, d).transpose(1, 0, 2)
    return np.concatenate(
        [cls_tok, g.reshape(1, side_new * side_new, d)], axis=1)


def stack_block_params(params: Dict[str, Any], depth: int,
                       block_key: str = "block") -> Dict[str, Any]:
    """Unrolled per-block trees → the stacked layout of nn.scan models
    (scan_blocks=True): every leaf gains a leading depth axis."""
    blocks = [params[f"{block_key}{i}"] for i in range(depth)]
    import jax

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *blocks)
    out = {k: v for k, v in params.items()
           if not (k.startswith(block_key) and k[len(block_key):].isdigit())}
    out["blocks"] = {"block": stacked}
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a .pt/.pth checkpoint's state_dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
    return ckpt
