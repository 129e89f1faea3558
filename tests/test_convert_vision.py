"""Vision-stack weight porting: TimeMamba / ViViM / CLIP state-dict
conversion + positional/temporal embedding inflation.

The torch-side state dicts are fabricated with the reference's exact key
layout (timemamba.py:235-275, vimamba.py:290-370, model_clip.py:46-105,
transformer.py:390-418); the mixer mathematics is already parity-tested
against the imported reference modules in test_reference_parity.py.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from video_mamba_suite_tpu.models.clip import CLIP
from video_mamba_suite_tpu.models.convert import (
    convert_attention,
    convert_clip,
    convert_text_transformer,
    convert_timemamba,
    convert_vivim,
    inflate_pos_embed,
    inflate_temporal_embed,
    stack_block_params,
)
from video_mamba_suite_tpu.models.timemamba import TimeMamba
from video_mamba_suite_tpu.models.vivim import ViViM


def _r(g, *shape):
    return torch.randn(*shape, generator=g) * 0.05


def _vim_sd(g, d, d_state=16, d_conv=4, expand=1):
    d_in = d * expand
    dt_rank = math.ceil(d / 16)
    out = {}
    for suf in ("", "_b"):
        out.update({
            f"conv1d{suf}.weight": _r(g, d_in, 1, d_conv),
            f"conv1d{suf}.bias": _r(g, d_in),
            f"x_proj{suf}.weight": _r(g, dt_rank + 2 * d_state, d_in),
            f"dt_proj{suf}.weight": _r(g, d_in, dt_rank),
            f"dt_proj{suf}.bias": _r(g, d_in),
            f"A{suf}_log": torch.log(
                torch.arange(1, d_state + 1, dtype=torch.float32)
            ).repeat(d_in, 1),
            f"D{suf}": torch.ones(d_in),
        })
    out["in_proj.weight"] = _r(g, 2 * d_in, d)
    out["out_proj.weight"] = _r(g, d, d_in)
    return out


def _mha_sd(g, d):
    return {
        "in_proj_weight": _r(g, 3 * d, d),
        "in_proj_bias": _r(g, 3 * d),
        "out_proj.weight": _r(g, d, d),
        "out_proj.bias": _r(g, d),
    }


def _timemamba_sd(g, d=32, depth=2, p=16, n_patches=4, out_dim=16):
    sd = {
        "patch_embed.proj.weight": _r(g, d, 3, p, p),
        "cls_token": _r(g, 1, 1, d),
        "pos_embed": _r(g, 1, n_patches + 1, d),
        "ln_pre.weight": torch.ones(d),
        "ln_pre.bias": torch.zeros(d),
        "norm.weight": torch.ones(d),
        "norm.bias": torch.zeros(d),
        "image_projection": _r(g, d, out_dim),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        for nm in ("norm1", "norm2", "norm3"):
            sd[b + nm + ".weight"] = torch.ones(d)
            sd[b + nm + ".bias"] = torch.zeros(d)
        for k, v in _mha_sd(g, d).items():
            sd[b + "attn." + k] = v
        sd[b + "mlp.fc1.weight"] = _r(g, 4 * d, d)
        sd[b + "mlp.fc1.bias"] = _r(g, 4 * d)
        sd[b + "mlp.fc2.weight"] = _r(g, d, 4 * d)
        sd[b + "mlp.fc2.bias"] = _r(g, d)
        for k, v in _vim_sd(g, d).items():
            sd[b + "time_mamba." + k] = v
    return sd


def _vivim_sd(g, d=32, depth=2, p=16, n_patches=4, frames=2, n_cls=5):
    sd = {
        "patch_embed.proj.weight": _r(g, d, 3, p, p),
        "patch_embed.proj.bias": _r(g, d),
        "cls_token": _r(g, 1, 1, d),
        "pos_embed": _r(g, 1, n_patches + 1, d),
        "temporal_embedding": _r(g, frames, 1, d),
        "norm_f.weight": torch.ones(d),
        "norm_f.bias": torch.zeros(d),
        "head.weight": _r(g, n_cls, d),
        "head.bias": torch.zeros(n_cls),
    }
    for i in range(depth):
        lp = f"layers.{i}."
        sd[lp + "norm.weight"] = torch.ones(d)
        sd[lp + "norm.bias"] = torch.zeros(d)
        for k, v in _vim_sd(g, d, expand=2).items():
            sd[lp + "mixer." + k] = v
    return sd


def _text_sd(g, width=32, layers=1, vocab=60, ctx=6, out_dim=16):
    sd = {
        "textual.token_embedding.weight": _r(g, vocab, width),
        "textual.positional_embedding": _r(g, ctx, width),
        "textual.ln_final.weight": torch.ones(width),
        "textual.ln_final.bias": torch.zeros(width),
        "textual.text_projection": _r(g, width, out_dim),
    }
    for i in range(layers):
        b = f"textual.transformer.resblocks.{i}."
        sd[b + "ln_1.weight"] = torch.ones(width)
        sd[b + "ln_1.bias"] = torch.zeros(width)
        sd[b + "ln_2.weight"] = torch.ones(width)
        sd[b + "ln_2.bias"] = torch.zeros(width)
        for k, v in _mha_sd(g, width).items():
            sd[b + "attn." + k] = v
        sd[b + "mlp.c_fc.weight"] = _r(g, 4 * width, width)
        sd[b + "mlp.c_fc.bias"] = _r(g, 4 * width)
        sd[b + "mlp.c_proj.weight"] = _r(g, width, 4 * width)
        sd[b + "mlp.c_proj.bias"] = _r(g, width)
    return sd


def test_convert_attention_matches_torch_mha():
    """Converted MHA weights reproduce torch's batch-first self-attention
    (the FlashMHA semantics the reference trains with)."""
    from video_mamba_suite_tpu.models.common import FusedMHA

    g = torch.Generator().manual_seed(0)
    d, heads = 32, 4
    sd = _mha_sd(g, d)
    mha = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    mha.in_proj_weight.data = sd["in_proj_weight"]
    mha.in_proj_bias.data = sd["in_proj_bias"]
    mha.out_proj.weight.data = sd["out_proj.weight"]
    mha.out_proj.bias.data = sd["out_proj.bias"]
    x = torch.randn(2, 5, d, generator=g)
    with torch.no_grad():
        want = mha(x, x, x, need_weights=False)[0].numpy()

    fused = FusedMHA(num_heads=heads)
    params = {"params": jax.tree_util.tree_map(
        jnp.asarray, convert_attention(sd, "", heads))}
    xj = jnp.asarray(x.numpy())
    got = np.asarray(fused.apply(params, xj))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # causal flag == torch's is_causal upper-triangular masking
    with torch.no_grad():
        want_c = mha(x, x, x, need_weights=False, is_causal=True,
                     attn_mask=torch.nn.Transformer.generate_square_subsequent_mask(5),
                     )[0].numpy()
    got_c = np.asarray(FusedMHA(num_heads=heads, causal=True).apply(params, xj))
    np.testing.assert_allclose(got_c, want_c, rtol=2e-4, atol=2e-4)


def test_convert_timemamba_applies():
    g = torch.Generator().manual_seed(0)
    sd = _timemamba_sd(g)
    model = TimeMamba(img_size=32, patch_size=16, embed_dim=32, depth=2,
                      num_heads=4, num_frames=2, ln_pre=True, output_dim=16,
                      impl="assoc")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 32, 32, 3)), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x)
    conv = {"params": jax.tree_util.tree_map(
        jnp.asarray, convert_timemamba(sd, depth=2, num_heads=4))}
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, conv["params"]))
    out = model.apply(conv, x)
    assert out.shape == (1, 16) and bool(jnp.all(jnp.isfinite(out)))


def test_convert_timemamba_stacked_scan_layout():
    """stack_block_params produces the nn.scan (scan_blocks=True) layout."""
    g = torch.Generator().manual_seed(0)
    sd = _timemamba_sd(g)
    params = convert_timemamba(sd, depth=2, num_heads=4)
    stacked = stack_block_params(params, depth=2)
    model = TimeMamba(img_size=32, patch_size=16, embed_dim=32, depth=2,
                      num_heads=4, num_frames=2, ln_pre=True, output_dim=16,
                      scan_blocks=True, impl="assoc")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 32, 32, 3)), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x)
    conv = {"params": jax.tree_util.tree_map(jnp.asarray, stacked)}
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, conv["params"]))
    # the stacked model must equal the unrolled one with the same weights
    um = TimeMamba(img_size=32, patch_size=16, embed_dim=32, depth=2,
                   num_heads=4, num_frames=2, ln_pre=True, output_dim=16,
                   impl="assoc")
    want = um.apply({"params": jax.tree_util.tree_map(
        jnp.asarray, convert_timemamba(sd, depth=2, num_heads=4))}, x)
    got = model.apply(conv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_convert_vivim_applies():
    g = torch.Generator().manual_seed(0)
    sd = _vivim_sd(g)
    model = ViViM(img_size=32, patch_size=16, num_frames=2, depth=2,
                  embed_dim=32, num_classes=5, impl="assoc")
    x = jnp.zeros((1, 2, 32, 32, 3))
    init = model.init({"params": jax.random.PRNGKey(0)}, x)
    conv = {"params": jax.tree_util.tree_map(
        jnp.asarray, convert_vivim(sd, depth=2))}
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, conv["params"]))
    out = model.apply(conv, x)
    assert out.shape == (1, 5) and bool(jnp.all(jnp.isfinite(out)))


def test_convert_clip_applies():
    g = torch.Generator().manual_seed(0)
    sd = {}
    for k, v in _vivim_sd(g, n_cls=5).items():
        if k.startswith("head."):
            continue
        sd["visual." + k] = v
    sd["visual.image_projection"] = _r(g, 32, 16)
    sd.update(_text_sd(g))
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07))

    model = CLIP(
        embed_dim=16, vision_tower="vivim",
        vision_cfg=dict(img_size=32, patch_size=16, num_frames=2, depth=2,
                        embed_dim=32, impl="assoc"),
        text_cfg=dict(context_length=6, vocab_size=60, width=32, heads=4,
                      layers=1),
    )
    videos = jnp.zeros((2, 2, 32, 32, 3))
    texts = jnp.zeros((2, 6), jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, videos, texts)
    conv = jax.tree_util.tree_map(
        jnp.asarray, convert_clip(sd, "vivim", vision_depth=2,
                                  text_layers=1, text_heads=4))
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, conv["params"]))
    img, txt, scale = model.apply(conv, videos, texts)
    assert img.shape == (2, 16) and bool(jnp.all(jnp.isfinite(img)))
    assert float(scale) == pytest.approx(1 / 0.07, rel=1e-5)


def test_inflate_temporal_embed_matches_torch_bilinear():
    """Our numpy inflation == the reference's F.interpolate(bilinear) on a
    (1,1,T,D) image (avion/models/utils.py:250-257)."""
    import torch.nn.functional as F

    e = torch.randn(4, 16, generator=torch.Generator().manual_seed(0))
    want = F.interpolate(e[None, None], (16, 16), mode="bilinear"
                         ).squeeze().numpy()
    got = inflate_temporal_embed(e.numpy(), 16, mode="bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # truncation on MORE loaded frames
    got2 = inflate_temporal_embed(e.numpy(), 2)
    np.testing.assert_array_equal(got2, e.numpy()[:2])
    # zeros mode + (T,1,D) passthrough shape
    got3 = inflate_temporal_embed(e.numpy()[:, None], 6, mode="zeros")
    assert got3.shape == (6, 1, 16)
    np.testing.assert_array_equal(got3[4:], 0)


def test_inflate_pos_embed_resizes_grid():
    pos = np.random.default_rng(0).standard_normal((1, 1 + 4, 8)).astype(
        np.float32)
    out = inflate_pos_embed(pos, 16)
    assert out.shape == (1, 17, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls kept
    same = inflate_pos_embed(pos, 4)
    np.testing.assert_array_equal(same, pos)
