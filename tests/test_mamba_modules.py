"""Mamba module tests: shapes, bidirectional symmetry, decode consistency.

Extends the reference's smoke test (/root/reference/mamba/test_mamba_module.py)
with the checks it lacks: step-decode vs full-sequence equivalence and
flip-equivariance of the bidirectional mixers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models import (
    MambaCausal,
    MambaDBM,
    MambaScanNorm,
    MambaVim,
    MambaLMHeadModel,
)
from video_mamba_suite_tpu.models.generation import GenerationConfig, generate


@pytest.mark.parametrize("cls", [MambaVim, MambaDBM, MambaScanNorm, MambaCausal])
def test_shapes_and_grads(cls):
    model = cls(d_model=32, d_state=8, expand=2, impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))

    def loss(p):
        return jnp.sum(model.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.all(jnp.isfinite(l)) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_vim_time_flip_equivariance():
    """A bidirectional mixer with mirrored params swapped should satisfy
    flip(f(x)) == f_swapped(flip(x)); with *identical* fwd/bwd params it is
    exactly flip-equivariant."""
    model = MambaVim(d_model=16, d_state=4, expand=1, impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 16))
    params = model.init(jax.random.PRNGKey(1), x)
    # make both directions share weights
    p = params["params"]
    p_shared = dict(p)
    p_shared["bwd"] = jax.tree_util.tree_map(lambda a: a, p["fwd"])
    params_shared = {"params": p_shared}
    y = model.apply(params_shared, x)
    y_flip = model.apply(params_shared, jnp.flip(x, axis=1))
    np.testing.assert_allclose(
        np.asarray(jnp.flip(y_flip, axis=1)), np.asarray(y), rtol=1e-4, atol=1e-4
    )


def test_causal_step_matches_full_forward():
    """Token-by-token decode == full-sequence forward (causal mixer)."""
    model = MambaCausal(d_model=24, d_state=8, d_conv=4, expand=2, impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
    params = model.init(jax.random.PRNGKey(1), x)
    full = model.apply(params, x)

    state = (
        jnp.zeros((2, 4, 48), jnp.float32),
        jnp.zeros((2, 48, 8), jnp.float32),
    )
    outs = []
    for t in range(10):
        o, state = model.apply(params, x[:, t], state, method="step")
        outs.append(o)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full), rtol=2e-3, atol=2e-3
    )


def test_lm_head_generate_smoke():
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=50)
    ids = jnp.array([[3, 7, 1]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (1, 3, 56)  # padded vocab (multiple of 8)

    out = generate(model, params, ids, GenerationConfig(max_length=8))
    assert out.shape == (1, 8)
    # prompt preserved
    np.testing.assert_array_equal(np.asarray(out[0, :3]), [3, 7, 1])


def test_lm_generate_greedy_matches_forward_argmax():
    """Greedy decode's first generated token == argmax of the full-forward
    logits at the last prompt position (state caching correctness)."""
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=50)
    ids = jnp.array([[3, 7, 1, 4]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    expect = int(jnp.argmax(logits[0, -1]))
    out = generate(model, params, ids, GenerationConfig(max_length=6))
    assert int(out[0, 4]) == expect


@pytest.mark.parametrize("cls", [MambaVim, MambaDBM])
def test_fused_bidir_matches_unfused(cls):
    """fuse_scan=True (one grouped scan) must equal the two-call path."""
    kw = dict(d_model=24, d_state=8, expand=2, impl="assoc")
    fused = cls(fuse_scan=True, **kw)
    unfused = cls(fuse_scan=False, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 24))
    mask = jnp.concatenate([jnp.ones((2, 14)), jnp.zeros((2, 6))], axis=1)
    params = fused.init(jax.random.PRNGKey(1), x)
    y1 = fused.apply(params, x, mask)
    y2 = unfused.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-4, atol=2e-4)
    # and without a mask
    y1 = fused.apply(params, x)
    y2 = unfused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-4, atol=2e-4)


def test_vivim_scan_norm_mixer_variant():
    """vivim_{tiny,small}_scan_norm registry parity
    (action-recognition/models/vivim_scan_norm.py:503-545): the mixer
    option swaps MambaVim for MambaScanNorm in both block paths."""
    from video_mamba_suite_tpu.models.vivim import ViViM

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
    outs = []
    for scan in (False, True):
        m = ViViM(img_size=32, patch_size=16, num_frames=2, depth=2,
                  embed_dim=32, num_classes=5, mixer="scan_norm",
                  scan_blocks=scan, impl="ref", drop_path_rate=0.0)
        p = m.init({"params": jax.random.PRNGKey(1)}, x)
        assert "scan_norm_w" in str(jax.tree_util.tree_structure(p)) or \
            any("scan_norm_w" in "/".join(map(str, path))
                for path, _ in jax.tree_util.tree_flatten_with_path(p)[0])
        outs.append(m.apply(p, x))
    assert outs[0].shape == outs[1].shape == (1, 5)


def test_causal_prefill_matches_steps():
    """One-shot prefill must land on EXACTLY the state the step loop
    reaches after the prompt (conv window + SSM state), and its per-token
    outputs must equal the full forward."""
    model = MambaCausal(d_model=24, d_state=8, d_conv=4, expand=2, impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
    params = model.init(jax.random.PRNGKey(1), x)

    out_pre, (conv_pre, ssm_pre) = model.apply(params, x, method="prefill")
    np.testing.assert_allclose(
        np.asarray(out_pre), np.asarray(model.apply(params, x)),
        rtol=1e-5, atol=1e-5)

    state = model.init_state(2)
    for t in range(10):
        _, state = model.apply(params, x[:, t], state, method="step")
    conv_step, ssm_step = state
    np.testing.assert_allclose(np.asarray(conv_pre), np.asarray(conv_step),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ssm_pre), np.asarray(ssm_step),
                               rtol=1e-4, atol=1e-4)

    # short-prompt corner: L < d_conv left-pads the conv window with zeros
    out3, (conv3, _) = model.apply(params, x[:, :3], method="prefill")
    assert out3.shape == (2, 3, 24)
    state = model.init_state(2)
    for t in range(3):
        _, state = model.apply(params, x[:, t], state, method="step")
    np.testing.assert_allclose(np.asarray(conv3), np.asarray(state[0]),
                               rtol=1e-5, atol=1e-5)


def test_lm_generate_prefill_matches_steploop():
    """Greedy decode through the batched-prefill path must produce the
    SAME tokens as the pure step loop (state-handoff correctness)."""
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=50)
    ids = jnp.array([[3, 7, 1, 4], [9, 2, 2, 8]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    cfg = GenerationConfig(max_length=10)
    out_pre = generate(model, params, ids, cfg, prefill=True)
    out_step = generate(model, params, ids, cfg, prefill=False)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_step))
    # prompt preserved verbatim
    np.testing.assert_array_equal(np.asarray(out_pre[:, :4]), np.asarray(ids))


def test_lm_generate_prefill_single_token_suffix():
    """genlen == 1: prefill + one sample, no decode scan."""
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=50)
    ids = jnp.array([[3, 7, 1, 4]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = generate(model, params, ids, GenerationConfig(max_length=5))
    logits = model.apply(params, ids)
    assert int(out[0, 4]) == int(jnp.argmax(logits[0, -1]))


def test_lm_generate_prefill_moe():
    """Prefill through an MoE-interleaved stack (the MoE FFN is stateless
    per position, so prefill routes it as a full-sequence call)."""
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=50,
                             moe_every=1, moe_num_experts=2)
    ids = jnp.array([[3, 7, 1, 4]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    cfg = GenerationConfig(max_length=8)
    out_pre = generate(model, params, ids, cfg, prefill=True)
    out_step = generate(model, params, ids, cfg, prefill=False)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_step))
