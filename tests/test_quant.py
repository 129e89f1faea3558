"""w8a8 serving-mode quantization (ops/quant.py, common.QuantDense).

The reference has no quantized path; this is a TPU-native serving addition
(BASELINE.md round-3/4 serving-mode notes). Tests pin the quantization
math, the nn.Dense param-tree compatibility, and end-to-end closeness.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from video_mamba_suite_tpu.models.common import QuantDense
from video_mamba_suite_tpu.ops.quant import int8_matmul, quantize_symmetric


def test_quantize_symmetric_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32)) * 3.0
    q, s = quantize_symmetric(x, axis=-1)
    assert q.dtype == jnp.int8
    err = jnp.abs(q.astype(jnp.float32) * s - x)
    # max quantization error is scale/2 per element
    assert float((err - s / 2).max()) < 1e-6


def test_quantize_zero_rows_safe():
    x = jnp.zeros((4, 8))
    q, s = quantize_symmetric(x, axis=-1)
    assert bool(jnp.all(q == 0)) and bool(jnp.all(jnp.isfinite(s)))


@pytest.mark.parametrize("shape", [(8, 64), (2, 5, 64)])
def test_int8_matmul_close_to_fp32(shape):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, shape)
    w = jax.random.normal(kw, (64, 48)) / 8.0
    ref = x @ w
    out = int8_matmul(x, w, out_dtype=jnp.float32)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert out.shape == ref.shape
    assert rel < 0.03  # 8-bit symmetric: ~1% typical, 3% bound


def test_int8_matmul_stops_gradients():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    w = jax.random.normal(jax.random.PRNGKey(3), (16, 8))
    g = jax.grad(lambda x: jnp.sum(int8_matmul(x, w, jnp.float32)))(x)
    assert bool(jnp.all(g == 0))


def test_quantdense_param_tree_matches_dense():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 32))
    d = nn.Dense(24)
    q = QuantDense(24)
    pd = d.init(jax.random.PRNGKey(5), x)["params"]
    pq = q.init(jax.random.PRNGKey(5), x)["params"]
    assert {k: v.shape for k, v in pd.items()} == \
        {k: v.shape for k, v in pq.items()}
    # same init → outputs close (the quantization is the only difference)
    a = d.apply({"params": pd}, x)
    b = q.apply({"params": pd}, x).astype(jnp.float32)
    cos = float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    assert cos > 0.999


def test_quant_timemamba_close():
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    kw = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
              num_frames=4, ln_pre=True, output_dim=32, scan_blocks=True,
              impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    m, mq = TimeMamba(**kw), TimeMamba(**kw, quant=True)
    p = m.init({"params": jax.random.PRNGKey(1)}, x)
    a = np.asarray(m.apply(p, x), np.float32)
    b = np.asarray(mq.apply(p, x), np.float32)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
