"""Fused Mamba inner function: conv → projections → selective scan → gate.

Capability match for the reference `MambaInnerFnNoOutProj` / `mamba_inner_fn`
(/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:155-633).
On TPU this is a *composition*, not a monolithic autograd.Function: the
projections are MXU matmuls XLA already schedules optimally, the conv is
shifted adds XLA fuses, and only the scan core needs a Pallas kernel.
XLA's rematerialization (jax.checkpoint at the module level) subsumes the
reference's `checkpoint_lvl` recompute logic (:218-221).

Weight convention: all projection matrices are (in_features, out_features)
(flax style; the reference uses torch's (out, in)).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .causal_conv1d import causal_conv1d
from .selective_scan import selective_scan


MASKED_DELTA = -1e4  # softplus(-1e4 + bias) == 0 ⇒ identity scan element


def mamba_inner(
    xz: jax.Array,
    conv_weight: jax.Array,
    conv_bias: Optional[jax.Array],
    x_proj_weight: jax.Array,
    dt_proj_weight: jax.Array,
    A: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = True,
    out_proj_weight: Optional[jax.Array] = None,
    out_proj_bias: Optional[jax.Array] = None,
    impl: str = "auto",
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the full Mamba mixer body on one direction.

    Args:
      xz: (batch, seqlen, 2 * d_inner) — output of in_proj, [x; z] halves.
      conv_weight: (width, d_inner) depthwise causal conv taps.
      conv_bias:   (d_inner,) or None.
      x_proj_weight: (d_inner, dt_rank + 2 * d_state).
      dt_proj_weight: (dt_rank, d_inner).
      A: (d_inner, d_state) — already -exp(A_log).
      D: (d_inner,) skip.
      delta_bias: (d_inner,) — dt_proj bias, added inside the scan (fp32).
      out_proj_weight: optional (d_inner, d_model) to fuse the output proj
        (reference `mamba_inner_fn`); if None, returns pre-projection output
        (reference `mamba_inner_fn_no_out_proj`).
      mask: optional (batch, seqlen) validity mask. Masked timesteps become
        identity scan elements (dt forced to 0 through the softplus), so
        outputs at valid positions are exactly invariant to padding content
        and length — a property the reference kernels lack (they integrate
        pad positions through the backward-direction scan) but which TPU
        static-shape bucketing requires (SURVEY.md §7 hard part c).

    Returns:
      (batch, seqlen, d_inner) if out_proj_weight is None else
      (batch, seqlen, d_model).
    """
    d_inner = xz.shape[-1] // 2
    dt_rank = dt_proj_weight.shape[0]
    d_state = A.shape[1]
    if mask is not None:
        xz = xz * mask.astype(xz.dtype)[..., None]
    x, z = xz[..., :d_inner], xz[..., d_inner:]

    x = causal_conv1d(x, conv_weight, conv_bias, activation="silu")

    x_dbl = jnp.dot(x, x_proj_weight.astype(x.dtype))  # (b, l, dt_rank + 2N)
    dt = x_dbl[..., :dt_rank]
    B = x_dbl[..., dt_rank : dt_rank + d_state]
    C = x_dbl[..., dt_rank + d_state :]
    dt = jnp.dot(dt, dt_proj_weight.astype(dt.dtype))  # (b, l, d_inner)
    if mask is not None:
        dt = jnp.where(mask[..., None] > 0, dt, MASKED_DELTA)

    y = selective_scan(
        x, dt, A, B, C, D=D, z=z,
        delta_bias=delta_bias, delta_softplus=delta_softplus, impl=impl,
    )
    if out_proj_weight is not None:
        y = jnp.dot(y, out_proj_weight.astype(y.dtype))
        if out_proj_bias is not None:
            y = y + out_proj_bias.astype(y.dtype)
    return y
