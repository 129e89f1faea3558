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


def test_ring_scan_reverse_matches_flipped_ref():
    """reverse=True == flip → scan → flip of the reference (the backward
    direction of bidirectional mixers)."""
    mesh = make_mesh(8, axes=("seq",))
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    b, l, d, n = 2, 64, 12, 4
    u = jax.random.normal(ks[0], (b, l, d))
    delta = 0.5 * jax.random.uniform(ks[1], (b, l, d))
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    z = jax.random.normal(ks[5], (b, l, d))
    D = jax.random.normal(ks[6], (d,))

    flip = lambda x: jnp.flip(x, axis=1)  # noqa: E731
    ref = flip(selective_scan_ref(
        flip(u), flip(delta), A, flip(B), flip(C), D=D, z=flip(z),
        delta_softplus=True,
    ))
    out = ring_selective_scan(
        mesh, u, delta, A, B, C, D=D, z=z, delta_softplus=True, reverse=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_ring_scan_pallas_impl_matches_ref():
    """The ring with the Pallas local kernel (interpret mode on CPU),
    exercising the kernel's initial_state input + exact last-state VJP."""
    mesh = make_mesh(4, axes=("seq",))
    ks = jax.random.split(jax.random.PRNGKey(4), 6)
    b, l, d, n = 1, 4 * 96, 8, 4  # local shard 96 > SHORT_SEQ_MAX → chunked
    u = jax.random.normal(ks[0], (b, l, d))
    delta = 0.5 * jax.random.uniform(ks[1], (b, l, d))
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n))
    C = jax.random.normal(ks[4], (b, l, n))
    g = jax.random.normal(ks[5], (b, l, d))

    ref = selective_scan_ref(u, delta, A, B, C, delta_softplus=True)
    out = ring_selective_scan(mesh, u, delta, A, B, C, delta_softplus=True,
                              impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss(fn):
        def f(u, delta):
            return jnp.sum(fn(u, delta) * g)
        return jax.grad(f, argnums=(0, 1))

    gr = loss(lambda u_, dt_: selective_scan_ref(
        u_, dt_, A, B, C, delta_softplus=True))(u, delta)
    gp = loss(lambda u_, dt_: ring_selective_scan(
        mesh, u_, dt_, A, B, C, delta_softplus=True, impl="pallas"))(u, delta)
    for a_, r_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(r_),
                                   rtol=5e-3, atol=5e-3)


def test_ring_mamba_vim_matches_unsharded():
    """Full sequence-parallel ViM mixer (conv halo + both ring directions)
    == the plain MambaVim forward, values and parameter grads."""
    from video_mamba_suite_tpu.models import MambaVim
    from video_mamba_suite_tpu.parallel import ring_mamba_vim

    mesh = make_mesh(4, axes=("seq",))
    d_model, l = 12, 64
    model = MambaVim(d_model=d_model, d_state=4, expand=2, impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(5), (2, l, d_model))
    params = model.init(jax.random.PRNGKey(6), x)

    want = model.apply(params, x)
    got = ring_mamba_vim(mesh, params, x, impl="assoc")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    g = jax.random.normal(jax.random.PRNGKey(7), want.shape)
    gr = jax.grad(lambda p: jnp.sum(model.apply(p, x) * g))(params)
    gp = jax.jit(jax.grad(
        lambda p: jnp.sum(ring_mamba_vim(mesh, p, x, impl="assoc") * g)
    ))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3),
        gp, gr,
    )


def test_ring_data_seq_mesh_train_step():
    """A ViM block trains over a ('data','seq') mesh; loss matches the
    unsharded step (VERDICT r1 item 6 'Done =' criterion)."""
    import optax

    from video_mamba_suite_tpu.models import MambaVim
    from video_mamba_suite_tpu.parallel import ring_mamba_vim

    mesh = make_mesh(8, axes=("data", "seq"), shape=(2, 4))
    d_model, l, batch = 8, 32, 4
    model = MambaVim(d_model=d_model, d_state=4, expand=1, impl="ref")
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    x = jax.random.normal(ks[0], (batch, l, d_model))
    y = jax.random.normal(ks[1], (batch, l, d_model))
    params = model.init(ks[2], x[:1])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_sharded(p, x, y):
        return jnp.mean((ring_mamba_vim(mesh, p, x, impl="assoc") - y) ** 2)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_sharded)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    from jax.sharding import NamedSharding

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "seq", None)))
    new_params, opt_state, loss = step(params, opt_state, xs, ys)
    ref_loss = jnp.mean((model.apply(params, x) - y) ** 2)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-3)
    assert np.isfinite(float(loss))


def test_ring_batch_axis_avoids_all_gather():
    """On a ('data','seq') mesh, `batch_axis='data'` keeps the batch local:
    the compiled HLO has ZERO all-gathers. Without it GSPMD silently
    regathers the full batch at the shard_map boundary (the failure mode
    hlo_audit exists to catch)."""
    import optax

    from video_mamba_suite_tpu.models import MambaVim
    from video_mamba_suite_tpu.parallel import (
        audit_collectives,
        collective_stats,
        ring_mamba_vim,
        ring_permute_budget,
    )

    mesh = make_mesh(8, axes=("data", "seq"), shape=(4, 2))
    model = MambaVim(d_model=8, d_state=4, expand=1, impl="assoc")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (8, 16, 8))
    y = jax.random.normal(ks[1], (8, 16, 8))
    params = model.init(ks[2], x[:1])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    from jax.sharding import NamedSharding

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", "seq", None)))

    def make_step(batch_axis):
        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                out = ring_mamba_vim(mesh, p, x, impl="assoc",
                                     batch_axis=batch_axis)
                return jnp.mean((out - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    good = make_step("data").lower(params, opt_state, xs, ys).compile()
    stats = collective_stats(good.as_text())
    param_bytes = sum(p.size * p.dtype.itemsize
                      for p in jax.tree_util.tree_leaves(params))
    audit_collectives(
        stats,
        max_all_gather_bytes=0,
        max_all_reduce_bytes=3 * param_bytes + 1024,
        expect_collective_permutes=ring_permute_budget(2, 2),
    )
    # loss parity with the unsharded step
    _, _, loss = good(params, opt_state, xs, ys)
    ref_loss = jnp.mean((model.apply(params, x) - y) ** 2)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-3)

    # the old (no batch_axis) spelling DOES regather the batch — the
    # detector fires (documents why batch_axis exists)
    bad = make_step(None).lower(params, opt_state, xs, ys).compile()
    assert collective_stats(bad.as_text()).nbytes("all-gather") > 0


def test_timemamba_ring_mode_matches_plain():
    """Composed data×seq flagship: TimeMamba with ring_mesh set (temporal
    adapters sequence-parallel over 'seq') == the plain forward, and its
    compiled HLO moves no all-gathers."""
    from video_mamba_suite_tpu.models.timemamba import TimeMamba
    from video_mamba_suite_tpu.parallel import collective_stats

    mesh = make_mesh(8, axes=("data", "seq"), shape=(4, 2))
    kw = dict(img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
              num_frames=8, ln_pre=True, output_dim=16, scan_blocks=True,
              impl="assoc")
    tm_plain = TimeMamba(**kw)
    tm_ring = TimeMamba(**kw, ring_mesh=mesh, ring_axes=("data", "seq"))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16, 16, 3))
    params = tm_plain.init({"params": jax.random.PRNGKey(2)}, x[:1])

    from jax.sharding import NamedSharding

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
    want = tm_plain.apply(params, x)
    fwd = jax.jit(lambda p, x: tm_ring.apply(p, x))
    compiled = fwd.lower(params, xs).compile()
    assert collective_stats(compiled.as_text()).nbytes("all-gather") == 0
    got = compiled(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_hlo_audit_parses_ops_and_bytes():
    from video_mamba_suite_tpu.parallel import audit_collectives, collective_stats

    hlo = """
  %ag = f32[8,4]{1,0} all-gather(f32[2,4]{1,0} %p0), dimensions={0}
  %ar = (f32[4]{0}, bf16[2,2]{1,0}) all-reduce(%a, %b), to_apply=%add
  %cp.1 = f32[16]{0} collective-permute(%x), source_target_pairs={{0,1}}
  %cps = f32[16]{0} collective-permute-start(%y), source_target_pairs={{1,0}}
  %cpd = f32[16]{0} collective-permute-done(%cps)
"""
    stats = collective_stats(hlo)
    assert stats.count("all-gather") == 1
    assert stats.nbytes("all-gather") == 8 * 4 * 4
    assert stats.count("all-reduce") == 1
    assert stats.nbytes("all-reduce") == 4 * 4 + 2 * 2 * 2
    assert stats.count("collective-permute") == 2  # start counted, done not
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        audit_collectives(stats, max_all_gather_bytes=0)
    audit_collectives(stats, max_all_gather_bytes=128,
                      expect_collective_permutes=(1, 4))
    # permute-count bounds are version-sensitive heuristics: out-of-range
    # WARNS by default (the entry-point dryrun must not fail on an XLA
    # upgrade), raises only under strict_permutes
    audit_collectives(stats, expect_collective_permutes=(5, 9))
    with _pytest.raises(AssertionError):
        audit_collectives(stats, expect_collective_permutes=(5, 9),
                          strict_permutes=True)
    # a2a floor: expert dispatch must actually ride all-to-all
    with _pytest.raises(AssertionError):
        audit_collectives(stats, min_all_to_all=1)
    stats2 = collective_stats(
        "  %a2a = f32[8,4]{1,0} all-to-all(f32[8,4]{1,0} %p0), dimensions={0}")
    audit_collectives(stats2, min_all_to_all=1)
