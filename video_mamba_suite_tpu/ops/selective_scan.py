"""Selective SSM scan — the innermost hot op of every Mamba variant.

Computes, per (batch b, channel d, state n):

    dt_t   = softplus(delta_t + delta_bias)           (optional)
    x_t    = exp(dt_t * A[d,n]) * x_{t-1} + dt_t * B_t[n] * u_t
    y_t[d] = sum_n C_t[n] * x_t[d,n]  (+ D[d] * u_t)  (* silu(z_t), optional)

Semantics match the reference `selective_scan_ref`
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152) and the
CUDA kernels (/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh),
including fp32 internal compute, optional complex A (output `y.real * 2`),
variable (input-dependent) B/C with optional groups, the D skip connection and
fused SiLU(z) gating.

TPU-native layout: time-major activations `(batch, seqlen, dim)` so `dim`
rides the lane dimension (the reference is channel-major `(B, D, L)`, a
CUDA-friendly layout that is wrong for TPU tiling).

Three implementations:
  * ``selective_scan_ref``   — `lax.scan` over time. O(L) sequential; the
    correctness oracle for all tests (CPU-runnable).
  * ``selective_scan_assoc`` — `lax.associative_scan` over time. O(log L)
    depth, pure XLA, autodiff-able; materializes the (B, L, D, N) discretized
    tensors in HBM, so it is bandwidth-bound.
  * Pallas chunked kernel (see `selective_scan_pallas.py`) — O(L) work with a
    carried chunk prefix, the production TPU path (analogue of the reference
    CUDA chunked `cub::BlockScan` design).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _is_complex(x) -> bool:
    return jnp.issubdtype(x.dtype, jnp.complexfloating)


def _expand_bc(bc: jax.Array, dim: int) -> jax.Array:
    """Expand variable B/C to (batch, seqlen, dim, dstate).

    Accepts (batch, seqlen, dstate) [shared across channels] or
    (batch, seqlen, ngroups, dstate) [grouped], mirroring the reference's
    (B, N, L) / (B, G, N, L) handling (selective_scan_interface.py:125-131).
    """
    if bc.ndim == 3:
        return bc[:, :, None, :]  # broadcast over dim
    if bc.ndim == 4:
        g = bc.shape[2]
        if g == dim:
            return bc
        reps = dim // g
        return jnp.repeat(bc, reps, axis=2)
    raise ValueError(f"variable B/C must be rank 3 or 4, got shape {bc.shape}")


def _prep_inputs(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    """Common fp32 casting + delta-bias/softplus + B/C normalization."""
    dtype_in = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    dim = A.shape[0]
    is_var_B = B.ndim >= 3
    is_var_C = C.ndim >= 3
    if not _is_complex(A):
        if not _is_complex(B):
            B = B.astype(jnp.float32)
        if not _is_complex(C):
            C = C.astype(jnp.float32)
    if D is not None:
        D = D.astype(jnp.float32)
    return dtype_in, u, delta, A, B, C, D, z, is_var_B, is_var_C, dim


def selective_scan_ref(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Sequential-reference selective scan (the correctness oracle).

    Args:
      u:     (batch, seqlen, dim) real.
      delta: (batch, seqlen, dim) real.
      A:     (dim, dstate) real or complex.
      B:     (dim, dstate) constant, or (batch, seqlen, dstate) /
             (batch, seqlen, ngroups, dstate) variable.
      C:     same family of shapes as B.
      D:     (dim,) skip, optional.
      z:     (batch, seqlen, dim) gate, optional (y * silu(z)).
      delta_bias: (dim,) fp32, optional.
      delta_softplus: apply softplus to delta (+bias).
      return_last_state: also return (batch, dim, dstate) final state.

    Mirrors /root/reference/.../selective_scan_interface.py:86-152.
    """
    (dtype_in, u, delta, A, B, C, D, z, is_var_B, is_var_C, dim) = _prep_inputs(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus
    )
    batch, seqlen, _ = u.shape
    dstate = A.shape[1]
    state_dtype = A.dtype if _is_complex(A) else jnp.float32

    # Discretize: deltaA (b, l, d, n), deltaB_u (b, l, d, n)
    deltaA = jnp.exp(delta[..., None] * A[None, None])
    if not is_var_B:
        deltaB_u = delta[..., None] * B[None, None] * u[..., None]
    else:
        Bx = _expand_bc(B, dim)
        deltaB_u = delta[..., None] * Bx * u[..., None]
    if is_var_C:
        Cx = _expand_bc(C, dim)  # (b, l, d or 1, n)

    def step(x, inputs):
        dA_t, dBu_t, c_t = inputs
        x = dA_t * x + dBu_t  # (b, d, n)
        if not is_var_C:
            y = jnp.einsum("bdn,dn->bd", x, C)
        else:
            y = jnp.einsum("bdn,bdn->bd", x, jnp.broadcast_to(c_t, x.shape))
        return x, y

    x0 = jnp.zeros((batch, dim, dstate), dtype=state_dtype)
    if is_var_C:
        c_scan = jnp.moveaxis(Cx, 1, 0)  # (l, b, d|1, n)
    else:
        c_scan = jnp.zeros((seqlen, 1, 1, 1), dtype=u.dtype)  # dummy
    last_state, ys = lax.scan(
        step, x0, (jnp.moveaxis(deltaA, 1, 0), jnp.moveaxis(deltaB_u, 1, 0), c_scan)
    )
    y = jnp.moveaxis(ys, 0, 1)  # (b, l, d)
    if jnp.issubdtype(y.dtype, jnp.complexfloating):
        y = y.real * 2
    out = y if D is None else y + u * D[None, None]
    if z is not None:
        out = out * jax.nn.silu(z.astype(jnp.float32))
    out = out.astype(dtype_in)
    return (out, last_state) if return_last_state else out


def selective_scan_assoc(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Selective scan via `lax.associative_scan` over the time axis.

    The first-order recurrence x_t = a_t x_{t-1} + b_t is associative under
    (a1, b1) ∘ (a2, b2) = (a1 a2, a2 b1 + b2), the same pair the reference
    CUDA kernel feeds to `cub::BlockScan` (selective_scan_common.h `SSMScanOp`).
    Pure XLA, works on any backend, fully autodiff-able.
    """
    (dtype_in, u, delta, A, B, C, D, z, is_var_B, is_var_C, dim) = _prep_inputs(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus
    )

    deltaA = jnp.exp(delta[..., None] * A[None, None])  # (b, l, d, n)
    if not is_var_B:
        deltaB_u = delta[..., None] * B[None, None] * u[..., None]
    else:
        deltaB_u = delta[..., None] * _expand_bc(B, dim) * u[..., None]
    if deltaB_u.dtype != deltaA.dtype:
        deltaB_u = deltaB_u.astype(deltaA.dtype)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    _, xs = lax.associative_scan(combine, (deltaA, deltaB_u), axis=1)
    # xs: (b, l, d, n) — the state trajectory

    if not is_var_C:
        y = jnp.einsum("bldn,dn->bld", xs, C)
    else:
        Cx = _expand_bc(C, dim)
        y = jnp.einsum("bldn,bldn->bld", xs, jnp.broadcast_to(Cx, xs.shape))
    if jnp.issubdtype(y.dtype, jnp.complexfloating):
        y = y.real * 2
    out = y if D is None else y + u * D[None, None]
    if z is not None:
        out = out * jax.nn.silu(z.astype(jnp.float32))
    out = out.astype(dtype_in)
    if return_last_state:
        return out, xs[:, -1]
    return out


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    impl: str = "auto",
    reverse: bool = False,
):
    """Dispatching front-end (equivalent of the reference `selective_scan_fn`).

    impl: 'auto' | 'pallas' | 'assoc' | 'ref'.
    'auto' uses the Pallas chunked kernel on TPU for variable B/C (the shape
    family every Mamba module actually uses), else 'assoc'. Complex A rides
    the two-channel real Pallas kernel (real variable B/C only; its training
    adjoint routes through the assoc path).

    reverse=True: the anti-causal scan == flip∘scan∘flip (the reference
    bidirectional mixers flip around the second `selective_scan_fn` call,
    mamba_simple.py bimamba paths). The pallas impl runs it FLIP-FREE on
    its inference fast paths (reverse kernels); assoc/ref compose flips.
    """
    if impl == "auto":
        use_pallas = (
            not _is_complex(B)
            and not _is_complex(C)
            and B.ndim >= 3
            and C.ndim >= 3
            and jax.default_backend() == "tpu"
        )
        if use_pallas and B.ndim == 4 and B.shape[2] > 1:
            # grouped B/C: the pallas wrapper shrinks its d-tile or channel-
            # pads narrow groups, so only divisibility of dim by G is needed
            use_pallas = u.shape[-1] % B.shape[2] == 0
        impl = "pallas" if use_pallas else "assoc"
    if impl == "pallas":
        from .selective_scan_pallas import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus, return_last_state=return_last_state,
            reverse=reverse,
        )
    if reverse:  # assoc/ref: plain flip composition
        def _f(x):
            return None if x is None else jnp.flip(x, axis=1)

        out = selective_scan(
            _f(u), _f(delta), A, _f(B), _f(C), D=D, z=_f(z),
            delta_bias=delta_bias, delta_softplus=delta_softplus,
            return_last_state=return_last_state, impl=impl)
        if return_last_state:
            out, last = out
            return _f(out), last
        return _f(out)
    if impl == "assoc":
        return selective_scan_assoc(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus, return_last_state=return_last_state,
        )
    if impl == "ref":
        return selective_scan_ref(
            u, delta, A, B, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus, return_last_state=return_last_state,
        )
    raise ValueError(f"unknown impl {impl!r}")
