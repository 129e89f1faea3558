"""Shared harness to import the REFERENCE'S OWN torch modules as parity
oracles (mamba_ssm + the egocentric avion towers) in this CUDA-less,
timm-less environment.

- CUDA extension modules are stubbed; the reference's pure-torch
  `selective_scan_ref` (selective_scan_interface.py:86-152) replaces every
  CUDA scan entry point, so the expected outputs come from reference code.
- `timm` / `flash_attn` are stubbed with eval-equivalent minimal pieces
  (DropPath at p=0 is identity; init helpers only shape the params we then
  OVERWRITE with converted weights).
"""

import importlib.machinery
import sys
import types

import torch


def _mk_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # importlib.util.find_spec chokes on in-sys.modules stubs with no spec
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod

REF_MAMBA = "/root/reference/mamba"
REF_AVION = "/root/reference/video-mamba-suite/egocentric-understanding"


def _stub_timm_flash():
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = _mk_module("timm")
        models = _mk_module("timm.models")
        layers = _mk_module("timm.models.layers")
        vt = _mk_module("timm.models.vision_transformer")
        registry = _mk_module("timm.models.registry")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # eval-only parity: p=0 ⇒ identity
                assert not self.training or self.drop_prob == 0.0
                return x

        def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                t.normal_(mean, std).clamp_(min=a * std, max=b * std)
            return t

        def lecun_normal_(t):
            return trunc_normal_(t, std=t.shape[-1] ** -0.5)

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        layers.lecun_normal_ = lecun_normal_
        vt.VisionTransformer = object
        vt._cfg = lambda **kw: kw
        vt._load_weights = None

        def register_model(fn):
            return fn

        registry.register_model = register_model
        models.layers, models.vision_transformer = layers, vt
        models.registry = registry
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
        sys.modules["timm.models.vision_transformer"] = vt
        sys.modules["timm.models.registry"] = registry

    if "flash_attn" not in sys.modules:
        fa = _mk_module("flash_attn")
        modules = _mk_module("flash_attn.modules")
        mha = _mk_module("flash_attn.modules.mha")
        mlp = _mk_module("flash_attn.modules.mlp")
        mha.MHA = None
        mha.FlashSelfAttention = None
        mha.SelfAttention = None
        mlp.Mlp = None
        fa.modules = modules
        modules.mha, modules.mlp = mha, mlp
        for name, mod in (("flash_attn", fa), ("flash_attn.modules", modules),
                          ("flash_attn.modules.mha", mha),
                          ("flash_attn.modules.mlp", mlp)):
            sys.modules[name] = mod


def import_reference_mamba():
    """Import reference mamba_ssm with CUDA modules stubbed, scan → ref.
    Returns (mamba_simple_mod, mamba_new_mod)."""
    if REF_MAMBA not in sys.path:
        sys.path.insert(0, REF_MAMBA)
    for name in ("causal_conv1d", "causal_conv1d_cuda", "selective_scan_cuda"):
        if name not in sys.modules:
            mod = _mk_module(name)
            mod.causal_conv1d_fn = None
            mod.causal_conv1d_update = None
            sys.modules[name] = mod
    import mamba_ssm.ops.selective_scan_interface as ssi
    import mamba_ssm.modules.mamba_simple as ms
    import mamba_ssm.modules.mamba_new as mn

    ms.selective_scan_fn = ssi.selective_scan_ref
    ms.causal_conv1d_fn = None  # force the use_pytorch_conv branch

    import torch.nn.functional as F
    from einops import rearrange

    def _inner_ref_no_out_proj(xz, conv1d_weight, conv1d_bias, x_proj_weight,
                               delta_proj_weight, A, B=None, C=None, D=None,
                               delta_bias=None, B_proj_bias=None,
                               C_proj_bias=None, delta_softplus=True):
        L = xz.shape[-1]
        delta_rank = delta_proj_weight.shape[1]
        d_state = A.shape[-1]
        x, z = xz.chunk(2, dim=1)
        d_inner = x.shape[1]
        w = conv1d_weight.shape[-1]
        x = F.silu(F.conv1d(x, conv1d_weight, conv1d_bias, padding=w - 1,
                            groups=d_inner)[..., :L])
        x_dbl = F.linear(rearrange(x, "b d l -> (b l) d"), x_proj_weight)
        delta = delta_proj_weight @ x_dbl[:, :delta_rank].t()
        delta = rearrange(delta, "d (b l) -> b d l", l=L)
        Bv = rearrange(x_dbl[:, delta_rank:delta_rank + d_state],
                       "(b l) n -> b n l", l=L).contiguous()
        Cv = rearrange(x_dbl[:, -d_state:], "(b l) n -> b n l",
                       l=L).contiguous()
        return ssi.selective_scan_ref(x, delta, A, Bv, Cv, D, z=z,
                                      delta_bias=delta_bias,
                                      delta_softplus=delta_softplus)

    # the fast path (use_fast_path=True — what the avion towers construct)
    # routes through the same torch oracle
    ms.mamba_inner_fn_no_out_proj = _inner_ref_no_out_proj
    mn.mamba_inner_fn_no_out_proj = _inner_ref_no_out_proj
    return ms, mn


def import_reference_avion():
    """Import the avion tower modules (timemamba / vimamba / transformer)
    with all stubs installed. Returns the three modules."""
    _stub_timm_flash()
    import_reference_mamba()
    if REF_AVION not in sys.path:
        sys.path.insert(0, REF_AVION)
    import avion.models.timemamba as tm
    import avion.models.transformer as tr
    import avion.models.vimamba as vm

    return tm, vm, tr
