"""Multi-device tests on the 8-device virtual CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4); these cover
what its SLURM jobs exercised blind: data-parallel batch sharding and the
(new) sequence-parallel ring scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from video_mamba_suite_tpu.ops import selective_scan_ref
from video_mamba_suite_tpu.parallel import make_mesh, ring_selective_scan, shard_batch


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("has_z,has_d", [(False, False), (True, True)])
def test_ring_scan_matches_ref(has_z, has_d):
    mesh = make_mesh(8, axes=("seq",))
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    b, l, d, n = 2, 64, 12, 4  # l divisible by 8 shards
    u = jax.random.normal(ks[0], (b, l, d))
    delta = 0.5 * jax.random.uniform(ks[1], (b, l, d))
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    D = jax.random.normal(ks[5], (d,)) if has_d else None
    z = jax.random.normal(ks[6], (b, l, d)) if has_z else None
    bias = 0.5 * jax.random.uniform(ks[7], (d,))

    ref = selective_scan_ref(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True
    )
    out = ring_selective_scan(
        mesh, u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_ring_scan_grad_matches_ref():
    mesh = make_mesh(8, axes=("seq",))
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    b, l, d, n = 1, 32, 8, 4
    u = jax.random.normal(ks[0], (b, l, d))
    delta = 0.5 * jax.random.uniform(ks[1], (b, l, d))
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    g = jax.random.normal(ks[5], (b, l, d))

    def loss_ref(u, delta, A):
        return jnp.sum(selective_scan_ref(u, delta, A, B, C, delta_softplus=True) * g)

    def loss_ring(u, delta, A):
        return jnp.sum(
            ring_selective_scan(mesh, u, delta, A, B, C, delta_softplus=True) * g
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(u, delta, A)
    gp = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(u, delta, A)
    for a_, r_ in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(r_), rtol=3e-3, atol=3e-3
        )


def test_data_parallel_training_step():
    """One sharded AdamW step on a Mamba block over an 8-way data mesh."""
    import optax
    from video_mamba_suite_tpu.models import MambaVim

    mesh = make_mesh(8, axes=("data",))
    model = MambaVim(d_model=16, d_state=4, expand=1, impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 12, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 12, 16))
    params = model.init(jax.random.PRNGKey(2), x[:2])
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    xb, yb = shard_batch(mesh, (x, y))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean((model.apply(p, x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p2, o2, loss = step(params, opt_state, xb, yb)
    assert jnp.isfinite(loss)
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda acc, l: acc + float(jnp.sum(jnp.abs(l))),
        jax.tree_util.tree_map(lambda a, b: a - b, p2, params), 0.0,
    )
    assert delta > 0


def test_tensor_parallel_mamba_matches_replicated():
    """d_inner sharded over a 'model' axis: TP forward == plain forward."""
    from video_mamba_suite_tpu.models import MambaVim
    from video_mamba_suite_tpu.parallel.tensor_parallel import (
        tp_mamba_forward,
        tp_shard_params,
    )

    mesh = make_mesh(8, axes=("model",))
    model = MambaVim(d_model=16, d_state=4, expand=2, impl="assoc",
                     fuse_scan=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    mask = jnp.concatenate([jnp.ones((2, 9)), jnp.zeros((2, 3))], axis=1)
    params = model.init(jax.random.PRNGKey(1), x)
    want = model.apply(params, x, mask)

    tp_params = tp_shard_params(mesh, params)
    got = jax.jit(
        lambda p, x, m: tp_mamba_forward(mesh, p, x, m)
    )(tp_params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
