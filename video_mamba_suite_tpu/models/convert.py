"""Torch checkpoint → flax parameter conversion.

Capability match for the reference's pretrained-weight loading
(/root/reference/mamba/mamba_ssm/utils/hf.py:9-23 `from_pretrained` and the
suite's model-zoo .pt loading). Maps the torch `state_dict` layouts of the
reference modules onto this framework's parameter trees so published
checkpoints port over (SURVEY.md §7 hard part f).

Covered layouts:
  * upstream causal `MambaLMHeadModel` (mixer_seq_simple.py) → MambaLMHeadModel
  * `mamba_simple.Mamba` bimamba-v2 (ViM) → MambaVim
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


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a .pt/.pth checkpoint's state_dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
    return ckpt
