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
from jax.ad_checkpoint import checkpoint_name

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
    return_last_state: bool = False,
    reverse: bool = False,
) -> jax.Array:
    """Run the full Mamba mixer body on one direction.

    reverse=True runs the whole body anti-causally WITHOUT flip copies:
    the conv becomes anti-causal (causal_conv1d reverse=True), the
    projections are pointwise in time, and the scan runs the reverse
    kernels — replacing the reference bimamba pattern
    flip(mamba_inner(flip(xz))) (mamba_simple.py backward-direction
    calls), whose two (b, L, 2·d_inner)-sized flips measured 42 ms/iter
    of exclusive compute at the 1M-token point.

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
      return_last_state: also return the final (batch, d_inner, d_state)
        SSM state — the one-shot-prefill handle (the reference prefills a
        decode session with a full forward at seqlen_offset=0,
        utils/generation.py:93-150).

    Returns:
      (batch, seqlen, d_inner) if out_proj_weight is None else
      (batch, seqlen, d_model); with return_last_state, a (out, last_state)
      tuple.
    """
    d_inner = xz.shape[-1] // 2
    dt_rank = dt_proj_weight.shape[0]
    d_state = A.shape[1]
    if mask is not None:
        xz = xz * mask.astype(xz.dtype)[..., None]
    x, z = xz[..., :d_inner], xz[..., d_inner:]

    x = causal_conv1d(x, conv_weight, conv_bias, activation="silu",
                      reverse=reverse)

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
        return_last_state=return_last_state, reverse=reverse,
    )
    last_state = None
    if return_last_state:
        y, last_state = y
    # named for targeted remat: save_only_these_names("mamba_scan_out")
    # keeps the scan output across the remat boundary so the bwd pass
    # skips re-running the fwd scan kernel (inert without that policy)
    y = checkpoint_name(y, "mamba_scan_out")
    if out_proj_weight is not None:
        y = jnp.dot(y, out_proj_weight.astype(y.dtype))
        if out_proj_bias is not None:
            y = y + out_proj_bias.astype(y.dtype)
    return (y, last_state) if return_last_state else y

def _proj_dt_bc(x, x_proj_weight, dt_proj_weight, d_state, mask):
    """x_proj → (dt, B, C) with dt projected and mask-forced (shared helper)."""
    dt_rank = dt_proj_weight.shape[0]
    x_dbl = jnp.dot(x, x_proj_weight.astype(x.dtype))
    dt = jnp.dot(x_dbl[..., :dt_rank], dt_proj_weight.astype(x.dtype))
    if mask is not None:
        dt = jnp.where(mask[..., None] > 0, dt, MASKED_DELTA)
    B = x_dbl[..., dt_rank : dt_rank + d_state]
    C = x_dbl[..., dt_rank + d_state :]
    return dt, B, C


def mamba_inner_bidir(
    xz_fwd: jax.Array,
    xz_bwd: jax.Array,
    fwd: dict,
    bwd: dict,
    A_fwd: jax.Array,
    A_bwd: jax.Array,
    mask: Optional[jax.Array] = None,
    impl: str = "auto",
):
    """Both directions of a bidirectional mixer in ONE fused scan call.

    The per-direction convs/projections stay separate (they are MXU matmuls
    XLA schedules anyway), but the two scans run in one kernel. On the
    short-seq path (video adapters) the fused bidirectional kernel
    interleaves both recurrences in the same step loop — the anti-causal
    direction scans backwards in place, so there are NO flip copies at all.
    Longer sequences stack the directions on the channel axis with grouped
    B/C (G=2). Exact either way: channels are independent in the recurrence.

    Args:
      xz_fwd/xz_bwd: (batch, seqlen, 2·d_inner) per-direction [x; z] streams,
        both in FORWARD time order.
        ViM passes the same stream twice; DBM passes its two streams.
      fwd/bwd: dicts with conv_w, conv_b, x_proj, dt_proj, dt_bias, D
        (the same dict twice for DBM's shared parameters).
      A_fwd/A_bwd: (d_inner, d_state), already −exp(A_log).

    Returns (out_fwd, out_bwd): both (batch, seqlen, d_inner), out_bwd
    already flipped back to forward time order.
    """
    d_inner = A_fwd.shape[0]
    d_state = A_fwd.shape[1]
    x, z = xz_fwd[..., :d_inner], xz_fwd[..., d_inner : 2 * d_inner]
    xb_raw = xz_bwd[..., :d_inner]
    zb_raw = xz_bwd[..., d_inner : 2 * d_inner]
    if mask is not None:
        m = mask.astype(xz_fwd.dtype)[..., None]
        x, z = x * m, z * m
        xb_raw, zb_raw = xb_raw * m, zb_raw * m

    from .selective_scan_pallas import SHORT_SEQ_MAX, selective_scan_pallas_bidir

    seqlen = x.shape[1]
    use_fused_short = (
        impl in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and -(-seqlen // 8) * 8 <= SHORT_SEQ_MAX
    )
    if use_fused_short:
        # flip-free: anti-causal conv + in-kernel backward scan
        xf = causal_conv1d(x, fwd["conv_w"], fwd.get("conv_b"),
                           activation="silu")
        xb = causal_conv1d(xb_raw, bwd["conv_w"], bwd.get("conv_b"),
                           activation="silu", reverse=True)
        dt_f, B_f, C_f = _proj_dt_bc(xf, fwd["x_proj"], fwd["dt_proj"],
                                     d_state, mask)
        dt_b, B_b, C_b = _proj_dt_bc(xb, bwd["x_proj"], bwd["dt_proj"],
                                     d_state, mask)
        out_f, out_b = selective_scan_pallas_bidir(
            xf, dt_f, A_fwd, B_f, C_f, xb, dt_b, A_bwd, B_b, C_b,
            Df=fwd["D"], zf=z, biasf=fwd["dt_bias"],
            Db=bwd["D"], zb=zb_raw, biasb=bwd["dt_bias"],
            delta_softplus=True,
        )
        return (checkpoint_name(out_f, "mamba_scan_out"),
                checkpoint_name(out_b, "mamba_scan_out"))

    x_b = jnp.flip(xb_raw, axis=1)
    z_b = jnp.flip(zb_raw, axis=1)
    mask_b = jnp.flip(mask, axis=1) if mask is not None else None

    xf = causal_conv1d(x, fwd["conv_w"], fwd.get("conv_b"), activation="silu")
    xb = causal_conv1d(x_b, bwd["conv_w"], bwd.get("conv_b"), activation="silu")
    dt_f, B_f, C_f = _proj_dt_bc(xf, fwd["x_proj"], fwd["dt_proj"], d_state, mask)
    dt_b, B_b, C_b = _proj_dt_bc(xb, bwd["x_proj"], bwd["dt_proj"], d_state,
                                 mask_b)

    u2 = jnp.concatenate([xf, xb], axis=-1)
    dt2 = jnp.concatenate([dt_f, dt_b], axis=-1)
    z2 = jnp.concatenate([z, z_b], axis=-1)
    A2 = jnp.concatenate([A_fwd, A_bwd], axis=0)
    D2 = jnp.concatenate([fwd["D"], bwd["D"]], axis=0)
    bias2 = jnp.concatenate([fwd["dt_bias"], bwd["dt_bias"]], axis=0)
    B2 = jnp.stack([B_f, B_b], axis=2)            # (b, l, 2, n)
    C2 = jnp.stack([C_f, C_b], axis=2)

    y2 = selective_scan(
        u2, dt2, A2, B2, C2, D=D2, z=z2, delta_bias=bias2,
        delta_softplus=True, impl=impl,
    )
    y2 = checkpoint_name(y2, "mamba_scan_out")
    out_f = y2[..., :d_inner]
    out_b = jnp.flip(y2[..., d_inner:], axis=1)
    return out_f, out_b
