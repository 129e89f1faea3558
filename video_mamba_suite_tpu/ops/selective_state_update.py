"""Single-token SSM state update for autoregressive decoding.

Capability match for the reference Triton kernel
(/root/reference/mamba/mamba_ssm/ops/triton/selective_state_update.py:21-155)
and its `selective_state_update_ref` (:157-192). Under XLA the whole decode
step is one fused elementwise expression inside a jitted scan loop, so the
Triton machinery (and the CUDA-graph capture around it, generation.py:243-377)
is unnecessary; the functional form returns the new state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def selective_state_update_ref(
    state: jax.Array,
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step.

    Args:
      state: (batch, dim, dstate) — SSM state (functional; new state returned).
      x:     (batch, dim)
      dt:    (batch, dim)
      A:     (dim, dstate)
      B, C:  (batch, dstate)
      D:     (dim,) optional skip
      z:     (batch, dim) optional gate
      dt_bias: (dim,) optional
    Returns:
      (y, new_state): y (batch, dim) in x.dtype, new_state in state.dtype.
    """
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)[None]
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    Af = A.astype(jnp.float32)
    dA = jnp.exp(dtf[..., None] * Af[None])            # (b, d, n)
    dB = dtf[..., None] * B.astype(jnp.float32)[:, None, :]  # (b, d, n)
    new_state = state.astype(jnp.float32) * dA + xf[..., None] * dB
    y = jnp.einsum("bdn,bn->bd", new_state, C.astype(jnp.float32))
    if D is not None:
        y = y + D.astype(jnp.float32)[None] * xf
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype), new_state.astype(state.dtype)


# XLA fuses the expression above into a single kernel; no separate fast path.
selective_state_update = selective_state_update_ref
