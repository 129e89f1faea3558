"""Offline int8 decode quantization (models/quant_decode.py + the
W8Dense/W8Embed transparent consumers in models/common.py).

Chip evidence: benchmarks/r15_decode_w8.py — 60.6k tok/s vs 22.8k bf16
(3.0x, 80% of the halved weight-streaming floor). These tests pin the
numerics and the tree contract on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models import MambaLMHeadModel
from video_mamba_suite_tpu.models.generation import (
    GenerationConfig,
    generate,
)
from video_mamba_suite_tpu.models.quant_decode import quantize_lm_for_decode


@pytest.fixture(scope="module")
def lm():
    model = MambaLMHeadModel(d_model=64, n_layer=2, vocab_size=97)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0, 97)
    params = model.init(jax.random.PRNGKey(1), ids)
    return model, params, ids


def test_quantize_tree_contract(lm):
    """int8 kernels + matching-path qscale entries; everything else cast
    to bf16; total bytes well under half of fp32."""
    model, params, _ = lm
    q = quantize_lm_for_decode(params)
    p = q["params"]
    emb = p["backbone"]["embedding"]["embedding"]
    assert emb.dtype == jnp.int8
    s_emb = q["qscale"]["backbone"]["embedding"]["embedding"]
    assert s_emb.shape == (emb.shape[0],) and s_emb.dtype == jnp.float32
    for i in range(2):
        mixer = p["backbone"][f"layers_{i}"]["mixer"]
        for proj in ("in_proj", "out_proj"):
            k = mixer[proj]["kernel"]
            assert k.dtype == jnp.int8, (i, proj)
            s = q["qscale"]["backbone"][f"layers_{i}"]["mixer"][proj]["kernel"]
            assert s.shape == (k.shape[1],)
        # the dt path stays full width (precision-sensitive)
        assert mixer["fwd"]["x_proj"].dtype == jnp.bfloat16
    fp = sum(l.size * l.dtype.itemsize
             for l in jax.tree_util.tree_leaves(params))
    qb = sum(l.size * l.dtype.itemsize
             for l in jax.tree_util.tree_leaves(q))
    assert qb < 0.4 * fp


def test_w8_forward_close_to_fp32(lm):
    """Full-sequence logits within per-channel-int8 tolerance."""
    model, params, ids = lm
    q = quantize_lm_for_decode(params)
    lg = model.apply(params, ids)
    lg8 = model.apply(q, ids)
    scale = float(jnp.max(jnp.abs(lg))) + 1e-9
    assert float(jnp.max(jnp.abs(lg8 - lg))) / scale < 0.05


def test_w8_step_and_prefill_close(lm):
    model, params, ids = lm
    q = quantize_lm_for_decode(params)
    st = model.init_states(2)
    l32, st32 = model.apply(params, ids[:, 0], st, method="step")
    l8, st8 = model.apply(q, ids[:, 0], st, method="step")
    scale = float(jnp.max(jnp.abs(l32))) + 1e-9
    assert float(jnp.max(jnp.abs(l8 - l32))) / scale < 0.05
    # states stay finite & close (the ssm state drives the whole suffix)
    for (c32, s32), (c8, s8) in zip(st32, st8):
        np.testing.assert_allclose(np.asarray(c8, np.float32),
                                   np.asarray(c32, np.float32),
                                   rtol=0.1, atol=0.05)
        np.testing.assert_allclose(np.asarray(s8, np.float32),
                                   np.asarray(s32, np.float32),
                                   rtol=0.1, atol=0.05)
    p32, _ = model.apply(params, ids, method="prefill")
    p8, _ = model.apply(q, ids, method="prefill")
    scale = float(jnp.max(jnp.abs(p32))) + 1e-9
    assert float(jnp.max(jnp.abs(p8 - p32))) / scale < 0.05


def test_w8_generate_runs_and_bf16_path_untouched(lm):
    """generate() runs jitted on w8 variables; the plain-params path is
    numerically IDENTICAL to before (W8Dense/W8Embed without qscale are
    exactly nn.Dense/nn.Embed)."""
    model, params, ids = lm
    cfg = GenerationConfig(max_length=12, top_k=1)
    q = quantize_lm_for_decode(params)
    out8 = jax.jit(lambda p, i: generate(model, p, i, cfg))(q, ids[:, :4])
    assert out8.shape == (2, 12)
    assert bool(jnp.all((out8 >= 0) & (out8 < 97)))
    out32 = generate(model, params, ids[:, :4], cfg)
    assert out32.shape == (2, 12)
