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


# ---------------------------------------------------------------------------
# head-major packed-qkv whole-row kernel (row_mha_qkv, benchmarks/r8_attn.py)


def _row_ref(qkv5):
    h = qkv5.shape[2] // 3
    q, k, v = qkv5[:, :, :h], qkv5[:, :, h:2 * h], qkv5[:, :, 2 * h:]
    dh = q.shape[-1]
    s = jnp.einsum("bthqd,bthkd->bthqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(dh)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bthqk,bthkd->bthqd", w, v)


@pytest.mark.parametrize("B,T,H,N,dh", [(2, 3, 4, 37, 16), (1, 2, 2, 197, 8)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_row_mha_qkv_fwd(B, T, H, N, dh, dtype):
    from video_mamba_suite_tpu.ops.vision_attention import row_mha_qkv

    qkv5 = jax.random.normal(jax.random.PRNGKey(0), (B, T, 3 * H, N, dh),
                             dtype)
    out = row_mha_qkv(qkv5, interpret=True)
    ref = _row_ref(qkv5)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    assert out.shape == ref.shape and out.dtype == dtype
    assert float(jnp.abs(out.astype(jnp.float32)
                         - ref.astype(jnp.float32)).max()) < tol


def test_row_mha_qkv_grads():
    from video_mamba_suite_tpu.ops.vision_attention import row_mha_qkv

    B, T, H, N, dh = 2, 2, 3, 29, 16
    qkv5 = jax.random.normal(jax.random.PRNGKey(1), (B, T, 3 * H, N, dh))
    g = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, N, dh))
    gk = jax.grad(lambda q: jnp.sum(row_mha_qkv(q, interpret=True) * g))(qkv5)
    gr = jax.grad(lambda q: jnp.sum(_row_ref(q) * g))(qkv5)
    assert float(jnp.abs(gk - gr).max()) < 1e-5


def test_fused_mha_row_matches_einsum_path():
    """FusedMHA(flash='row') computes the same function as the default
    seq_axis=1 einsum path from the SAME parameters (identical param tree:
    the head-major projections reshape the Dense kernels at apply time)."""
    from video_mamba_suite_tpu.models.common import FusedMHA

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 3, 32))  # (B,S,T,D)
    base = FusedMHA(num_heads=4, seq_axis=1)
    row = FusedMHA(num_heads=4, seq_axis=1, flash="row")
    params = base.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(
        row.init(jax.random.PRNGKey(1), x)) == \
        jax.tree_util.tree_structure(params)
    a = base.apply(params, x)
    b = row.apply(params, x)
    assert float(jnp.abs(a - b).max()) < 1e-5

    g = jax.random.normal(jax.random.PRNGKey(2), a.shape)
    ga = jax.grad(lambda p: jnp.sum(base.apply(p, x) * g))(params)
    gb = jax.grad(lambda p: jnp.sum(row.apply(p, x) * g))(params)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        assert float(jnp.abs(la - lb).max()) < 1e-4
