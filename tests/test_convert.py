"""Weight porting: torch reference modules → flax params, output parity.

The strongest parity check available without network access: build the
*reference's own* module layout in torch, convert weights, and compare
forward outputs within fp32 tolerance (SURVEY.md §7 hard part f).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from video_mamba_suite_tpu.models import MambaCausal, MambaLMHeadModel
from video_mamba_suite_tpu.models.convert import (
    convert_mamba_lm,
    convert_mamba_mixer,
)


def _torch_mixer_state(d_model, d_state, d_conv, expand, dt_rank, seed=0):
    """Fabricate a torch-layout causal Mamba state dict (upstream
    mamba_simple layout) with random weights."""
    g = torch.Generator().manual_seed(seed)
    d_inner = d_model * expand

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    sd = {
        "in_proj.weight": r(2 * d_inner, d_model),
        "conv1d.weight": r(d_inner, 1, d_conv),
        "conv1d.bias": r(d_inner),
        "x_proj.weight": r(dt_rank + 2 * d_state, d_inner),
        "dt_proj.weight": r(d_inner, dt_rank),
        "dt_proj.bias": r(d_inner),
        "A_log": torch.log(torch.arange(1, d_state + 1, dtype=torch.float32)
                           ).repeat(d_inner, 1),
        "D": torch.ones(d_inner),
        "out_proj.weight": r(d_model, 2 * d_inner)[:, :d_inner],
    }
    return sd


def _torch_reference_forward(sd, x, d_state, d_conv, dt_rank):
    """Run the reference's slow path in torch: conv → projections → scan.

    Mirrors mamba_simple.python_mamba_inner_fn_no_out_proj + out_proj
    (mamba_simple.py:157-199) using selective_scan_ref semantics.
    """
    import torch.nn.functional as F

    B, L, D = x.shape
    d_inner = sd["conv1d.weight"].shape[0]
    xz = x @ sd["in_proj.weight"].T                     # (B, L, 2*d_inner)
    xs, z = xz.split(d_inner, dim=-1)
    # causal depthwise conv + silu
    xt = xs.transpose(1, 2)
    conv = F.conv1d(xt, sd["conv1d.weight"], sd["conv1d.bias"],
                    padding=d_conv - 1, groups=d_inner)[..., :L]
    u = F.silu(conv).transpose(1, 2)                    # (B, L, d_inner)
    x_dbl = u @ sd["x_proj.weight"].T
    dt, Bv, Cv = x_dbl.split([dt_rank, d_state, d_state], dim=-1)
    dt = dt @ sd["dt_proj.weight"].T                    # (B, L, d_inner)
    dt = F.softplus(dt + sd["dt_proj.bias"])
    A = -torch.exp(sd["A_log"])
    h = torch.zeros(B, d_inner, d_state)
    ys = []
    for t in range(L):
        dA = torch.exp(dt[:, t, :, None] * A[None])
        dBu = dt[:, t, :, None] * Bv[:, t, None, :] * u[:, t, :, None]
        h = dA * h + dBu
        ys.append(torch.einsum("bdn,bn->bd", h, Cv[:, t]))
    y = torch.stack(ys, dim=1) + u * sd["D"][None, None]
    y = y * F.silu(z)
    return y @ sd["out_proj.weight"].T


def test_converted_mixer_matches_torch_reference():
    d_model, d_state, d_conv, expand = 16, 8, 4, 2
    dt_rank = math.ceil(d_model / 16)
    sd = _torch_mixer_state(d_model, d_state, d_conv, expand, dt_rank)

    x = torch.randn(2, 24, d_model, generator=torch.Generator().manual_seed(1))
    want = _torch_reference_forward(sd, x, d_state, d_conv, dt_rank).numpy()

    model = MambaCausal(d_model=d_model, d_state=d_state, d_conv=d_conv,
                        expand=expand, impl="ref")
    xj = jnp.asarray(x.numpy())
    params = model.init(jax.random.PRNGKey(0), xj)
    converted = {"params": convert_mamba_mixer({k: v for k, v in sd.items()})}
    # structural compatibility
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, params["params"])
    conv_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted["params"])
    assert ref_shapes == conv_shapes
    got = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, converted), xj
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_convert_lm_structure():
    d_model, n_layer, vocab = 16, 2, 40
    sd = {"backbone.embedding.weight": torch.randn(vocab, d_model),
          "backbone.norm_f.weight": torch.ones(d_model)}
    dt_rank = math.ceil(d_model / 16)
    for i in range(n_layer):
        mix = _torch_mixer_state(d_model, 16, 4, 2, dt_rank, seed=i)
        for k, v in mix.items():
            sd[f"backbone.layers.{i}.mixer.{k}"] = v
        sd[f"backbone.layers.{i}.norm.weight"] = torch.ones(d_model)
    params = convert_mamba_lm(sd, n_layer)

    model = MambaLMHeadModel(d_model=d_model, n_layer=n_layer, vocab_size=vocab)
    ids = jnp.zeros((1, 4), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), ids)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape,
                                        params["params"])
    assert ref_shapes == got_shapes
    logits = model.apply(jax.tree_util.tree_map(jnp.asarray, params), ids)
    assert bool(jnp.all(jnp.isfinite(logits)))
