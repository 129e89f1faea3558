"""Pipeline parallelism: GPipe-style stage pipeline over a 'stage' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.4 — data-parallel
only); these tests pin the beyond-reference capability: a pipelined Block
stack must be value- and gradient-identical to the sequential stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models import make_block
from video_mamba_suite_tpu.parallel import make_mesh
from video_mamba_suite_tpu.parallel.pipeline import (
    pipeline_apply,
    pp_mamba_blocks,
    pp_stack_params,
    split_microbatches,
)


def _blocks(n_layers, d, **kw):
    block = make_block(d, mixer="vim", expand=1, d_state=4, impl="assoc", **kw)
    x = jnp.zeros((1, 8, d))
    params = [block.init(jax.random.PRNGKey(i), x) for i in range(n_layers)]
    return block, params


def _sequential(block, params, x):
    h, res = x, None
    for p in params:
        h, res = block.apply(p, h, res)
    return h, res


def test_pipeline_apply_identity_stages():
    """Plain pipeline plumbing: S scale-by-2 stages == one 2^S scale."""
    mesh = make_mesh(4, axes=("stage",))
    params = jnp.arange(1, 5, dtype=jnp.float32).reshape(4, 1)  # (S, 1)
    mbs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 8))   # M=3

    out = pipeline_apply(
        mesh, lambda p, a: a * p[0], params, mbs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mbs) * 24.0, rtol=1e-6)


@pytest.mark.parametrize("n_micro", [2, 4])
def test_pp_blocks_match_sequential(n_micro):
    d, n_layers, n_stages = 16, 4, 4
    block, params = _blocks(n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 12, d))

    h_ref, res_ref = _sequential(block, params, x)

    mesh = make_mesh(n_stages, axes=("stage",))
    sp = pp_stack_params(params, n_stages, mesh)
    h, res = pp_mamba_blocks(mesh, block, sp, x, n_micro)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res), np.asarray(res_ref),
                               rtol=2e-5, atol=2e-5)


def test_pp_blocks_two_layers_per_stage():
    d, n_layers, n_stages = 16, 4, 2
    block, params = _blocks(n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 10, d))
    h_ref, res_ref = _sequential(block, params, x)

    mesh = make_mesh(n_stages, axes=("stage",))
    sp = pp_stack_params(params, n_stages, mesh)
    h, res = pp_mamba_blocks(mesh, block, sp, x, 4)
    np.testing.assert_allclose(np.asarray(h + res), np.asarray(h_ref + res_ref),
                               rtol=2e-5, atol=2e-5)


def test_pp_gradients_match_sequential():
    """jax.grad through the pipeline (ppermute/psum transposes) equals the
    sequential stack's gradients — no hand-written backward schedule."""
    d, n_layers, n_stages = 12, 2, 2
    block, params = _blocks(n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 6, d))
    mesh = make_mesh(n_stages, axes=("stage",))
    sp = pp_stack_params(params, n_stages, mesh)

    def loss_seq(plist):
        h, res = _sequential(block, plist, x)
        return jnp.mean((h + res) ** 2)

    def loss_pp(stacked):
        h, res = pp_mamba_blocks(mesh, block, stacked, x, n_microbatches=2)
        return jnp.mean((h + res) ** 2)

    g_seq = jax.grad(loss_seq)(params)
    g_seq_stacked = pp_stack_params(g_seq, n_stages)
    g_pp = jax.grad(loss_pp)(sp)

    flat_ref, _ = jax.tree_util.tree_flatten(g_seq_stacked)
    flat_pp, _ = jax.tree_util.tree_flatten(g_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_pp_blocks_bf16_residual_stream():
    """residual_in_fp32=False keeps the residual stream in the activation
    dtype — the pipeline's carry init must follow (regression: fp32 zeros
    made the tick scan carry flip dtype after the first layer)."""
    d, n_layers, n_stages = 16, 2, 2
    block, params = _blocks(n_layers, d, residual_in_fp32=False)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 6, d))
    h_ref, res_ref = _sequential(block, params, x)
    mesh = make_mesh(n_stages, axes=("stage",))
    sp = pp_stack_params(params, n_stages, mesh)
    h, res = pp_mamba_blocks(mesh, block, sp, x, 2)
    assert res.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(h + res),
                               np.asarray(h_ref + res_ref),
                               rtol=2e-5, atol=2e-5)


def test_split_microbatches_errors():
    with pytest.raises(ValueError):
        split_microbatches(jnp.zeros((5, 2)), 2)
    with pytest.raises(ValueError):
        pp_stack_params([{"w": jnp.zeros(2)}] * 3, 2)
