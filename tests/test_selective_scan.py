"""Selective-scan correctness: fast paths vs the sequential reference.

Port of the reference test matrix
(/root/reference/mamba/tests/ops/test_selective_scan.py:40-150): parametrized
forward AND gradient equivalence across seqlen / variable-B/C / groups / z /
D / delta-bias / softplus / dtypes, with dtype-dependent tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.ops import (
    selective_scan_assoc,
    selective_scan_ref,
)


def _make_inputs(
    rng,
    batch=2,
    dim=24,
    dstate=8,
    seqlen=128,
    is_variable_B=True,
    is_variable_C=True,
    varBC_groups=1,
    has_D=True,
    has_z=True,
    has_delta_bias=True,
    itype=jnp.float32,
    is_complex=False,
):
    ks = list(jax.random.split(rng, 10))
    u = jax.random.normal(ks[0], (batch, seqlen, dim), dtype=itype)
    delta = 0.5 * jax.random.uniform(ks[1], (batch, seqlen, dim), dtype=itype)
    if is_complex:
        A = -0.5 * jax.random.uniform(ks[2], (dim, dstate)) + 1j * jax.random.uniform(
            ks[3], (dim, dstate)
        )
        A = A.astype(jnp.complex64)
    else:
        A = (-0.5 * jax.random.uniform(ks[2], (dim, dstate))).astype(jnp.float32)
    if not is_variable_B:
        B = jax.random.normal(ks[4], (dim, dstate), dtype=jnp.float32)
    elif varBC_groups == 1:
        B = jax.random.normal(ks[4], (batch, seqlen, dstate), dtype=itype)
    else:
        B = jax.random.normal(ks[4], (batch, seqlen, varBC_groups, dstate), dtype=itype)
    if not is_variable_C:
        C = jax.random.normal(ks[5], (dim, dstate), dtype=jnp.float32)
    elif varBC_groups == 1:
        C = jax.random.normal(ks[5], (batch, seqlen, dstate), dtype=itype)
    else:
        C = jax.random.normal(ks[5], (batch, seqlen, varBC_groups, dstate), dtype=itype)
    D = jax.random.normal(ks[6], (dim,), dtype=jnp.float32) if has_D else None
    z = jax.random.normal(ks[7], (batch, seqlen, dim), dtype=itype) if has_z else None
    delta_bias = (
        0.5 * jax.random.uniform(ks[8], (dim,), dtype=jnp.float32)
        if has_delta_bias
        else None
    )
    g = jax.random.normal(ks[9], (batch, seqlen, dim), dtype=jnp.float32)
    return u, delta, A, B, C, D, z, delta_bias, g


def _loss_through(fn, u, delta, A, B, C, D, z, delta_bias, g, delta_softplus):
    """Scalar loss = <out, g> so grads of all inputs are comparable."""

    def loss(u, delta, A, B, C, D, z, delta_bias):
        out = fn(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus,
        )
        return jnp.sum(out.astype(jnp.float32) * g)

    diff_args = (u, delta, A, B, C)
    if D is not None:
        diff_args += (D,)
    argnums = tuple(range(5)) + ((5,) if D is not None else ())
    # grad w.r.t. all array args that exist
    wrt = [0, 1, 2, 3, 4]
    if D is not None:
        wrt.append(5)
    if z is not None:
        wrt.append(6)
    if delta_bias is not None:
        wrt.append(7)
    val, grads = jax.value_and_grad(loss, argnums=tuple(wrt))(
        u, delta, A, B, C, D, z, delta_bias
    )
    return val, grads


TOL = {
    jnp.dtype(jnp.float32): dict(rtol=6e-4, atol=2e-3),
    jnp.dtype(jnp.bfloat16): dict(rtol=3e-2, atol=5e-2),
}


@pytest.mark.parametrize("itype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("seqlen", [8, 128, 372, 1024])
@pytest.mark.parametrize("has_z", [False, True])
@pytest.mark.parametrize("has_D", [False, True])
@pytest.mark.parametrize("varBC_groups", [1, 2])
@pytest.mark.parametrize("is_variable", [False, True])
def test_assoc_vs_ref(itype, seqlen, has_z, has_D, varBC_groups, is_variable):
    if varBC_groups > 1 and not is_variable:
        pytest.skip("groups only apply to variable B/C")
    rng = jax.random.PRNGKey(seqlen + has_z * 7 + has_D * 13 + varBC_groups)
    u, delta, A, B, C, D, z, delta_bias, g = _make_inputs(
        rng, seqlen=seqlen, is_variable_B=is_variable, is_variable_C=is_variable,
        varBC_groups=varBC_groups, has_D=has_D, has_z=has_z, itype=itype,
    )
    tol = TOL[jnp.dtype(itype)]

    out_ref, last_ref = selective_scan_ref(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=True,
    )
    out, last = selective_scan_assoc(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(out_ref, dtype=np.float32), **tol,
    )
    np.testing.assert_allclose(np.asarray(last), np.asarray(last_ref), rtol=1e-3, atol=1e-3)

    # gradient equivalence
    _, grads_ref = _loss_through(
        selective_scan_ref, u, delta, A, B, C, D, z, delta_bias, g, True
    )
    _, grads = _loss_through(
        selective_scan_assoc, u, delta, A, B, C, D, z, delta_bias, g, True
    )
    gtol = dict(rtol=1e-2, atol=1e-2) if itype == jnp.bfloat16 else dict(rtol=2e-3, atol=2e-3)
    for ga, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(ga, dtype=np.float32),
            np.asarray(gr, dtype=np.float32), **gtol,
        )


@pytest.mark.parametrize("seqlen", [64, 256])
def test_complex_A(seqlen):
    rng = jax.random.PRNGKey(seqlen)
    u, delta, A, B, C, D, z, delta_bias, _ = _make_inputs(
        rng, seqlen=seqlen, is_complex=True,
        is_variable_B=False, is_variable_C=False,
    )
    out_ref = selective_scan_ref(
        u, delta, A, B.astype(jnp.complex64), C.astype(jnp.complex64),
        D=D, z=z, delta_bias=delta_bias, delta_softplus=True,
    )
    out = selective_scan_assoc(
        u, delta, A, B.astype(jnp.complex64), C.astype(jnp.complex64),
        D=D, z=z, delta_bias=delta_bias, delta_softplus=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-3, atol=1e-3)


def test_return_last_state_matches_sequential():
    """last_state equals the state after explicitly stepping the recurrence."""
    rng = jax.random.PRNGKey(0)
    u, delta, A, B, C, D, z, delta_bias, _ = _make_inputs(rng, seqlen=37, dim=8, dstate=4)
    _, last = selective_scan_ref(
        u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=True,
    )
    # manual recurrence
    dt = jax.nn.softplus(delta.astype(jnp.float32) + delta_bias[None, None])
    x = np.zeros((u.shape[0], A.shape[0], A.shape[1]), np.float32)
    un = np.asarray(u, np.float32)
    dtn = np.asarray(dt)
    An = np.asarray(A)
    Bn = np.asarray(B, np.float32)
    for t in range(u.shape[1]):
        dA = np.exp(dtn[:, t][..., None] * An[None])
        dBu = dtn[:, t][..., None] * Bn[:, t][:, None, :] * un[:, t][..., None]
        x = dA * x + dBu
    np.testing.assert_allclose(np.asarray(last), x, rtol=1e-4, atol=1e-4)
