"""Expert parallelism: Switch-style MoE MLP over an 'expert' mesh axis.

Beyond-reference capability (SURVEY.md §2.4 — the reference is DP-only);
these tests pin the routing semantics and that EP-sharded execution matches
the single-device result exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.parallel import make_mesh
from video_mamba_suite_tpu.parallel.expert import (
    MoEMlp,
    ep_shard_params,
    moe_dispatch,
)


def test_dispatch_routes_to_argmax_expert():
    logits = jnp.array([[2.0, 0.0, 0.0],
                        [0.0, 3.0, 0.0],
                        [0.0, 0.0, 1.0],
                        [4.0, 0.0, 0.0]])
    dispatch, combine, aux = moe_dispatch(logits, capacity=2)
    routed = np.asarray(jnp.einsum("nec->ne", dispatch))
    np.testing.assert_array_equal(
        routed, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 0, 0]])
    # combine weight is the chosen expert's softmax prob
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nec->n", combine)), probs.max(-1), rtol=1e-6)
    assert np.isfinite(float(aux))


def test_dispatch_respects_capacity():
    # all four tokens pick expert 0; capacity 2 keeps the first two
    logits = jnp.tile(jnp.array([[5.0, 0.0]]), (4, 1))
    dispatch, _, _ = moe_dispatch(logits, capacity=2)
    per_token = np.asarray(jnp.einsum("nec->n", dispatch))
    np.testing.assert_array_equal(per_token, [1, 1, 0, 0])
    # no queue slot is double-booked
    assert np.asarray(jnp.einsum("nec->ec", dispatch)).max() == 1


def _reference_moe(params, x, capacity):
    """Per-token dense evaluation of the chosen expert (numpy oracle)."""
    p = params["params"]
    n, d = x.reshape(-1, x.shape[-1]).shape
    tok = np.asarray(x.reshape(n, d), np.float32)
    logits = tok @ np.asarray(p["gate"])
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    probs = np.asarray(probs)
    expert = logits.argmax(-1)
    counts = {}
    out = np.zeros_like(tok)
    for i in range(n):
        e = int(expert[i])
        slot = counts.get(e, 0)
        counts[e] = slot + 1
        if slot >= capacity:
            continue
        h = tok[i] @ np.asarray(p["w1"][e]) + np.asarray(p["b1"][e])
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=True))
        y = h @ np.asarray(p["w2"][e]) + np.asarray(p["b2"][e])
        out[i] = probs[i, e] * y
    return out.reshape(x.shape)


@pytest.mark.parametrize("capacity_factor", [1.25, 0.5])
def test_moe_mlp_matches_per_token_oracle(capacity_factor):
    import math

    b, l, d, h, e = 2, 6, 8, 16, 4
    model = MoEMlp(d_model=d, d_hidden=h, num_experts=e,
                   capacity_factor=capacity_factor, group_size=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, l, d))
    params = model.init(jax.random.PRNGKey(1), x)
    out, aux = model.apply(params, x)
    cap = max(1, math.ceil(b * l / e * capacity_factor))
    ref = _reference_moe(params, x, cap)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    assert np.isfinite(float(aux))


def test_moe_grouping_matches_per_row_oracle():
    """Default grouping routes each batch row independently (GShard token
    groups): masks stay linear in token count and the result equals the
    flat computation applied per row."""
    b, l, d, h, e = 3, 8, 8, 16, 2
    grouped = MoEMlp(d_model=d, d_hidden=h, num_experts=e)       # -1 default
    flat = MoEMlp(d_model=d, d_hidden=h, num_experts=e, group_size=0)
    x = jax.random.normal(jax.random.PRNGKey(7), (b, l, d))
    params = grouped.init(jax.random.PRNGKey(8), x)
    out_g, _ = grouped.apply(params, x)
    rows = [flat.apply(params, x[i:i + 1])[0] for i in range(b)]
    np.testing.assert_allclose(np.asarray(out_g),
                               np.asarray(jnp.concatenate(rows, axis=0)),
                               rtol=2e-5, atol=2e-5)


def test_moe_ep_sharded_matches_unsharded():
    b, l, d, h, e = 4, 8, 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(2), (b, l, d))
    plain = MoEMlp(d_model=d, d_hidden=h, num_experts=e)
    params = plain.init(jax.random.PRNGKey(3), x)
    out_ref, aux_ref = plain.apply(params, x)

    mesh = make_mesh(4, axes=("expert",))
    sharded = MoEMlp(d_model=d, d_hidden=h, num_experts=e, mesh=mesh)
    sp = ep_shard_params(mesh, params)
    out, aux = jax.jit(lambda p, x: sharded.apply(p, x))(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


def test_moe_ep_gradients_match_unsharded():
    """EP-sharded gradients == unsharded gradients (the repo's fwd+grad
    test convention, CLAUDE.md)."""
    b, l, d, h, e = 4, 8, 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(9), (b, l, d))
    plain = MoEMlp(d_model=d, d_hidden=h, num_experts=e)
    params = plain.init(jax.random.PRNGKey(10), x)

    def loss(m):
        def f(p):
            out, aux = m.apply(p, x)
            return jnp.mean(out ** 2) + 0.01 * aux
        return f

    g_ref = jax.grad(loss(plain))(params)

    mesh = make_mesh(4, axes=("expert",))
    sharded = MoEMlp(d_model=d, d_hidden=h, num_experts=e, mesh=mesh)
    g_ep = jax.jit(jax.grad(loss(sharded)))(ep_shard_params(mesh, params))
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_ep = jax.tree_util.tree_leaves(g_ep)
    for a, b_ in zip(flat_ref, flat_ep):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)


def test_moe_mamba_lm_forward_and_aux():
    """MoE-Mamba LM: interleaved Switch-FFN blocks, sown aux loss."""
    from video_mamba_suite_tpu.models import MambaLMHeadModel

    model = MambaLMHeadModel(d_model=16, n_layer=4, vocab_size=50,
                             moe_every=2, moe_num_experts=2)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 50)
    params = model.init(jax.random.PRNGKey(1), ids)
    # two MoE blocks were created (after layers 2 and 4)
    flat = jax.tree_util.tree_leaves_with_path(params)
    moe_paths = {str(p) for p, _ in flat if "moe" in str(p)}
    assert any("moe_blocks_1" in s for s in moe_paths)
    assert any("moe_blocks_3" in s for s in moe_paths)

    logits, state = model.apply(params, ids, mutable=["intermediates"])
    assert logits.shape == (2, 12, model.padded_vocab)
    aux = model.apply(params, state["intermediates"],
                      method=model.moe_aux_loss)
    assert float(aux) > 0.0


def test_moe_mamba_lm_decode_matches_forward():
    """Step decode == full forward when routing is drop-free (per-token
    top-1 routing has no cross-token coupling except the capacity cap)."""
    from video_mamba_suite_tpu.models import MambaLMHeadModel

    model = MambaLMHeadModel(d_model=16, n_layer=2, vocab_size=40,
                             moe_every=1, moe_num_experts=2,
                             moe_capacity_factor=8.0)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, 40)
    params = model.init(jax.random.PRNGKey(3), ids)
    full = model.apply(params, ids)

    states = model.apply(params, 2, method=model.init_states)
    outs = []
    for t in range(ids.shape[1]):
        logit, states = model.apply(params, ids[:, t], states,
                                    method=model.step)
        outs.append(logit)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_moe_training_step_reduces_loss():
    b, l, d = 4, 8, 8
    import optax

    mesh = make_mesh(2, axes=("expert",))
    model = MoEMlp(d_model=d, d_hidden=16, num_experts=2, mesh=mesh)
    x = jax.random.normal(jax.random.PRNGKey(4), (b, l, d))
    y = jax.random.normal(jax.random.PRNGKey(5), (b, l, d)) * 0.1
    params = ep_shard_params(mesh, model.init(jax.random.PRNGKey(6), x))
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            out, aux = model.apply(p, x)
            return jnp.mean((out - y) ** 2) + 0.01 * aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(8):
        params, opt, loss = step(params, opt, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
