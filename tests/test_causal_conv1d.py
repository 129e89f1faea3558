"""Causal conv1d + decode-update correctness.

Port of /root/reference/causal-conv1d/tests/test_causal_conv1d.py:29-115:
widths 2–4, seqlens to 4096, fwd + grad vs a numpy oracle, and the
single-token update vs running the full conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.ops import causal_conv1d, causal_conv1d_update


def _numpy_causal_conv(x, w, b):
    batch, seqlen, dim = x.shape
    width = w.shape[0]
    xp = np.pad(x, ((0, 0), (width - 1, 0), (0, 0)))
    out = np.zeros_like(x)
    for k in range(width):
        out += xp[:, k : k + seqlen] * w[k][None, None]
    if b is not None:
        out += b[None, None]
    return out


@pytest.mark.parametrize("width", [2, 3, 4])
@pytest.mark.parametrize("seqlen", [1, 17, 128, 4096])
@pytest.mark.parametrize("has_bias", [False, True])
@pytest.mark.parametrize("silu", [False, True])
def test_causal_conv1d_fwd(width, seqlen, has_bias, silu):
    rng = np.random.default_rng(width * 100 + seqlen)
    x = rng.standard_normal((2, seqlen, 12)).astype(np.float32)
    w = rng.standard_normal((width, 12)).astype(np.float32)
    b = rng.standard_normal((12,)).astype(np.float32) if has_bias else None
    out = causal_conv1d(
        jnp.asarray(x), jnp.asarray(w),
        jnp.asarray(b) if b is not None else None,
        activation="silu" if silu else None,
    )
    want = _numpy_causal_conv(x, w, b)
    if silu:
        want = want / (1 + np.exp(-want)) * 1.0 * np.ones_like(want)
        want = _numpy_causal_conv(x, w, b)
        want = want * (1.0 / (1.0 + np.exp(-want)))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_grad():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

    def loss(x, w, b):
        return jnp.sum(causal_conv1d(x, w, b, activation="silu") ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    # numerical check on a few coordinates
    eps = 1e-3
    for arr_idx, (arr, name) in enumerate([(x, "x"), (w, "w"), (b, "b")]):
        flat = np.asarray(arr).ravel()
        idx = min(3, flat.size - 1)
        bump = np.zeros_like(flat)
        bump[idx] = eps
        up = jnp.asarray((flat + bump).reshape(arr.shape))
        dn = jnp.asarray((flat - bump).reshape(arr.shape))
        args_up, args_dn = [x, w, b], [x, w, b]
        args_up[arr_idx] = up
        args_dn[arr_idx] = dn
        num = (loss(*args_up) - loss(*args_dn)) / (2 * eps)
        ana = np.asarray(g[arr_idx]).ravel()[idx]
        np.testing.assert_allclose(num, ana, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("width", [2, 3, 4])
def test_causal_conv1d_update_matches_full(width):
    """Stepping token-by-token equals the full causal conv."""
    rng = np.random.default_rng(width)
    seqlen, dim = 10, 6
    x = jnp.asarray(rng.standard_normal((3, seqlen, dim)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((width, dim)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((dim,)).astype(np.float32))
    full = causal_conv1d(x, w, b, activation="silu")

    state = jnp.zeros((3, width, dim), jnp.float32)
    outs = []
    for t in range(seqlen):
        o, state = causal_conv1d_update(x[:, t], state, w, b, activation="silu")
        outs.append(o)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_reverse_conv_equals_flip_conv_flip():
    """reverse=True == flip → causal conv → flip (the anti-causal stream of
    bidirectional mixers, computed without the two copies)."""
    import jax

    from video_mamba_suite_tpu.ops.causal_conv1d import causal_conv1d

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (2, 13, 8))
    w = jax.random.normal(ks[1], (4, 8))
    b = jax.random.normal(ks[2], (8,))
    want = jnp.flip(causal_conv1d(jnp.flip(x, 1), w, b, activation="silu"), 1)
    got = causal_conv1d(x, w, b, activation="silu", reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
