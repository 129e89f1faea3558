"""VMEM-resident whole-row attention (ops/vision_attention.py) vs the einsum
reference — fwd + grads, interpret mode (CPU).

Reference semantics: the spatial MHA inside SpaceTimeBlock
(egocentric-understanding/avion/models/timemamba.py:148-170).
"""

import math

import jax
import jax.numpy as jnp
import pytest

from video_mamba_suite_tpu.ops.vision_attention import vision_mha


def _ref(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("ihqd,ihkd->ihqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("ihqk,ihkd->ihqd", w, v)


@pytest.mark.parametrize("I,H,N,dh", [(4, 3, 37, 16), (2, 2, 197, 8)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_vision_mha_fwd(I, H, N, dh, dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (I, H, N, dh), dtype) for kk in ks)
    out = vision_mha(q, k, v, interpret=True)
    ref = _ref(q, k, v)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    assert out.shape == ref.shape and out.dtype == dtype
    assert float(jnp.abs(out.astype(jnp.float32)
                         - ref.astype(jnp.float32)).max()) < tol


def test_vision_mha_grads():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    I, H, N, dh = 3, 2, 29, 16
    q, k, v = (jax.random.normal(kk, (I, H, N, dh)) for kk in ks[:3])
    g = jax.random.normal(ks[3], (I, H, N, dh))

    gr = jax.grad(lambda *a: jnp.vdot(_ref(*a), g), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda *a: jnp.vdot(vision_mha(*a, interpret=True), g),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gp):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_vision_mha_rejects_long_rows():
    x = jnp.zeros((1, 1, 1024, 16))
    with pytest.raises(ValueError):
        vision_mha(x, x, x, interpret=True)
