"""Pallas TPU chunked selective-scan kernel with custom VJP.

TPU-native analogue of the reference CUDA kernels
(/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh and
 selective_scan_bwd_kernel.cuh + reverse_scan.cuh): the sequence is processed
in chunks with a carried (state) prefix, exactly like the CUDA kernel's
`smem_running_prefix` (fwd_kernel.cuh:251-254); the per-chunk initial states
are checkpointed to HBM for the backward (the CUDA `x_ptr` checkpoints,
selective_scan.cpp:249), which walks chunks in reverse, recomputes the
in-chunk forward states, and runs the adjoint (suffix) scan — the
`BlockReverseScan` analogue (reverse_scan.cuh:19-100).

Design:
  * Grid: (batch_tiles, dim_tiles, seq_chunks); the seq axis is innermost so
    a VMEM scratch buffer carries the running (bt, n, d) state across chunks
    of one (batch-tile, d-tile).
  * In-kernel layout: blocks (bt, chunk, d_tile) with d_tile riding the TPU
    lane axis (128); the recurrence state is (bt, dstate, d_tile).
  * The recurrence runs as a SEQUENTIAL unrolled walk over the chunk's
    timesteps — 2 FMAs per (b, n, d) lane where a parallel scan does
    2·log2(c) — with the batch tiled into the block so every step still
    fills the VPU. This is the same work-vs-depth choice the CUDA kernel
    makes per thread (sequential within a thread's items, scan only across
    threads, selective_scan_fwd_kernel.cuh:214-248); measured ~2.6x the
    Hillis–Steele in-chunk variant it replaced.
  * delta-bias + softplus, discretization, C-projection, D-skip and SiLU(z)
    gating are all fused into the kernel (SSMParamsBase semantics,
    selective_scan.h:26-101).

Shapes (time-major, dim last — see selective_scan.py):
  u, delta, z: (batch, seqlen, dim)   B, C: (batch, seqlen, dstate)
  A: (dim, dstate)   D, delta_bias: (dim,)
The wrapper pads seqlen/dim to chunk/tile multiples (padding with delta=0
⇒ a=1, b=0 ⇒ identity scan elements, so results are unaffected).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Empirically best on v5e at Mamba scales (b8 l2048 d1024 n16 sweep of the
# sequential-chunk kernel: fwd 7.6 Mtok/s at chunk 64, 8.3 at 128 — but the
# bwd's per-step state recompute only fits VMEM up to chunk 64).
DEFAULT_CHUNK = 64
DEFAULT_DTILE = 256
# Long-path batch tiling: bt ≈ LONG_BT_ELEMS/chunk rows of the batch ride in
# each block so the sequential in-chunk walk fills the VPU; the bwd cap is
# lower because it holds chunk recomputed (bt, n, dtile) states in VMEM.
LONG_BT_ELEMS = 1024
LONG_BT_ELEMS_BWD = 128  # bwd holds chunk·bt·n·dtile recomputed states in
                         # VMEM (8.4 MB at bt=2/chunk=64 — bt=4 would blow
                         # the ~16 MB scoped budget)
# At or below this batch the long path uses the Hillis–Steele in-chunk
# kernels instead (one batch row per grid step): the sequential walk's
# per-step work (bt·n·dtile lanes) starves the VPU without batch to tile,
# while the parallel pass vectorizes over the chunk axis (TAL eval batch-1,
# single-stream 1M-token forwards).
HS_BATCH_MAX = 4
HS_CHUNK = 32  # tuned round-1 default for the parallel in-chunk pass
# Above this seqlen, lane-starved small batches take the segment-parallel
# two-pass route instead of Hillis–Steele: split L into S segments run as a
# batch (filling the VPU), combine the per-segment summaries — total decay is
# exactly exp(A·Σdt), so only the local last-states need pass 1 — then a
# second batched pass with the exact incoming states. 2× the scan work at
# ~10–16× the lane occupancy (see _segmented_scan; measured speedup on the
# 1M-token bidirectional MambaVim standing point recorded in BASELINE.md).
SEG_MIN_SEQ = 32768
SEG_TARGET_ROWS = 64  # S·batch sized so the sequential walk's bt tiles fill


def _batch_tile(batch: int, chunk: int, elems: int) -> int:
    """Largest batch tile ≤ elems/chunk with minimal padding waste: split the
    batch into the fewest tiles, then size tiles evenly."""
    cap = max(1, elems // chunk)
    nbt = -(-batch // cap)
    return -(-batch // nbt)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _chunk_prep(u_ref, delta_ref, b_ref, c_ref, bias_t, softplus: bool,
                li, chunk: int, seqlen: int):
    """Shared fwd/bwd prologue: load one (bt, chunk, d) block, discretize,
    mask padding. Timesteps at or beyond the true seqlen get dt = 0 (⇒ a = 1,
    bu = 0, an identity scan element), so seq padding never perturbs the
    carried state. B/C are transposed ONCE to (bt, n, c) so the step loop
    slices time on lanes (see _short_prep).
    """
    u = u_ref[...].astype(jnp.float32)             # (bt, c, d)
    dt_pre = delta_ref[...].astype(jnp.float32) + bias_t[None]
    dt = jax.nn.softplus(dt_pre) if softplus else dt_pre
    pos = li * chunk + jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    mask = (pos < seqlen).astype(jnp.float32)      # (bt, c, d)
    dt = dt * mask
    bmat = jnp.swapaxes(b_ref[0].astype(jnp.float32), 1, 2)  # (bt, n, c)
    cmat = jnp.swapaxes(c_ref[0].astype(jnp.float32), 1, 2)
    return u, dt_pre, dt, mask, bmat, cmat


def _fwd_kernel(
    u_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, z_ref, bias_ref, h0_ref,
    out_ref, *rest,
    softplus: bool, has_d: bool, has_z: bool, nchunks: int,
    chunk: int, seqlen: int, want_states: bool = True,
    reverse: bool = False,
):
    """Sequential in-chunk walk over (bt, n, d) state tiles.

    The recurrence runs as an unrolled SEQUENTIAL loop over the chunk's
    timesteps — 2 FMAs per (b, n, d) lane where a Hillis–Steele pass does
    2·log2(c) — with the batch tiled into the block so every step still
    fills the VPU (the same work-vs-depth choice as the CUDA kernel's
    per-thread items, selective_scan_fwd_kernel.cuh:214-248, and as this
    file's short-seq path). The carried (bt, n, d) prefix in VMEM scratch is
    the smem_running_prefix analogue (:251-254); chunk-initial states are
    checkpointed to HBM for the backward (x_ptr, selective_scan.cpp:249).
    Measured ~2.6x the Hillis–Steele in-chunk variant it replaced
    (b8 l2048 d1024 n16 on v5e).

    reverse=True runs the ANTI-causal recurrence h_t = a_t·h_{t+1} + b_t·u_t
    flip-free: the index maps visit chunks last-to-first (the CUDA
    BlockReverseScan direction, reverse_scan.cuh:19-100) and the in-chunk
    loop walks t backwards; h0 enters at the sequence END and `last` is the
    state at t=0. Primal-only (inference): the training VJP routes through
    the flip-based composition (`_rev_core`), so this path never
    checkpoints states.
    """
    if want_states:
        states_ref, last_ref, h_carry = rest
    else:
        (last_ref, h_carry), states_ref = rest, None
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        # initial state: zeros normally; an incoming prefix when the caller
        # chains shards (sequence parallelism) or resumes a stream
        h_carry[...] = h0_ref[...]

    a_t = a_ref[...].astype(jnp.float32)           # (n, d) — A tile, transposed
    bias_t = bias_ref[0].astype(jnp.float32)       # (d,) broadcasts
    li_eff = nchunks - 1 - li if reverse else li   # time-chunk this step sees
    u, _, dt, _, bmat, cmat = _chunk_prep(
        u_ref, delta_ref, b_ref, c_ref, bias_t, softplus, li_eff, chunk,
        seqlen)
    bt, c, d = u.shape
    dtu = dt * u

    h = h_carry[...]                               # (bt, n, d) carried prefix
    if want_states:
        states_ref[...] = h[:, None]               # checkpoint for the bwd

    ys = [None] * c
    for t in (reversed(range(c)) if reverse else range(c)):
        a = jnp.exp(_row1(dt, t)[:, None, :] * a_t[None])
        h = a * h + _row1(dtu, t)[:, None, :] * _col(bmat, t)
        ys[t] = jnp.sum(h * _col(cmat, t), axis=1)[:, None]
    y = jnp.concatenate(ys, axis=1)                # (bt, c, d)

    if has_d:
        y = y + u * d_ref[0].astype(jnp.float32)[None]
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        y = y * (z * jax.nn.sigmoid(z))
    out_ref[...] = y.astype(out_ref.dtype)

    h_carry[...] = h

    @pl.when(li == nchunks - 1)
    def _():
        last_ref[...] = h


def _bwd_kernel(
    u_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, z_ref, bias_ref,
    states_ref, g_ref, glast_ref,
    du_ref, ddelta_ref, da_ref, db_ref, dc_ref, dd_ref, dz_ref, dbias_ref,
    dh0_ref,
    dh_carry,
    *, softplus: bool, has_d: bool, has_z: bool, nchunks: int,
    chunk: int, seqlen: int,
):
    """Reverse chunk walk: recompute in-chunk forward states from the
    checkpointed chunk-initial state (the CUDA bwd's x_ptr recompute,
    bwd_kernel.cuh:141-146), then run the sequential adjoint recurrence
    dh_t = C_t⊗gy_t + a_{t+1}⊙dh_{t+1} backwards through the chunk,
    carrying the cross-chunk cotangent in VMEM scratch."""
    li = pl.program_id(2)  # index maps reverse it: li=0 is the LAST chunk

    @pl.when(li == 0)
    def _():
        # adjoint seeded with the last-state cotangent (exact, unlike the
        # reference SelectiveScanFn which drops it)
        dh_carry[...] = glast_ref[...]
        da_ref[0] = jnp.zeros_like(da_ref[0])
        dd_ref[0] = jnp.zeros_like(dd_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    a_t = a_ref[...].astype(jnp.float32)
    bias_t = bias_ref[0].astype(jnp.float32)
    u, dt_pre, dt, mask, bmat, cmat = _chunk_prep(
        u_ref, delta_ref, b_ref, c_ref, bias_t, softplus,
        nchunks - 1 - li, chunk, seqlen)
    bt, c, d = u.shape
    n = a_t.shape[0]
    dtu = dt * u

    # forward recompute from the chunk-initial checkpoint, keeping per-step
    # states in VMEM (a_step is recomputed in the reverse loop — exp is
    # cheap on the VPU, a second c·bt·n·d buffer is not)
    h0 = states_ref[...][:, 0]                     # (bt, n, d)
    h = h0
    hs = [None] * c
    for t in range(c):
        a = jnp.exp(_row1(dt, t)[:, None, :] * a_t[None])
        h = a * h + _row1(dtu, t)[:, None, :] * _col(bmat, t)
        hs[t] = h

    g = g_ref[...].astype(jnp.float32)             # (bt, c, d) dL/dout
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        silu = z * sig
        ys = [jnp.sum(hs[t] * _col(cmat, t), axis=1)[:, None]
              for t in range(c)]
        y_pre = jnp.concatenate(ys, axis=1)
        if has_d:
            y_pre = y_pre + u * d_ref[0].astype(jnp.float32)[None]
        dz_ref[...] = (g * y_pre * (sig + silu * (1.0 - sig))).astype(
            dz_ref.dtype)
        gy = g * silu                              # grad w.r.t. pre-gate y
    else:
        gy = g

    # reverse sequential adjoint; dh_carry arrives as a_first·dh of the
    # NEXT chunk (already folded), leaves as this chunk's same quantity
    dh = dh_carry[...]                             # (bt, n, d)
    da_acc = jnp.zeros((n, d), jnp.float32)
    dcs, dbs, ddts, dus = [None] * c, [None] * c, [None] * c, [None] * c
    for t in range(c - 1, -1, -1):
        gy_t = _row1(gy, t)                        # (bt, d)
        a = jnp.exp(_row1(dt, t)[:, None, :] * a_t[None])
        dh = _col(cmat, t) * gy_t[:, None, :] + dh
        h_prev = hs[t - 1] if t > 0 else h0
        da_el = dh * h_prev * a                    # (bt, n, d)
        da_acc = da_acc + jnp.sum(da_el * _row1(dt, t)[:, None, :], axis=0)
        dcs[t] = jnp.sum(gy_t[:, None, :] * hs[t], axis=2)[:, :, None]
        dbs[t] = jnp.sum(dh * _row1(dtu, t)[:, None, :], axis=2)[:, :, None]
        dh_b = jnp.sum(dh * _col(bmat, t), axis=1)  # (bt, d)
        ddts[t] = (jnp.sum(da_el * a_t[None], axis=1)
                   + dh_b * _row1(u, t))[:, None]
        dus[t] = (dh_b * _row1(dt, t))[:, None]
        dh = a * dh
    dh_carry[...] = dh

    @pl.when(li == nchunks - 1)
    def _():
        # after chunk 0 the carry IS ∂L/∂h0 (the incoming-prefix cotangent)
        dh0_ref[...] = dh

    da_ref[0] += da_acc
    dc_ref[0] = jnp.swapaxes(
        jnp.concatenate(dcs, axis=2), 1, 2).astype(dc_ref.dtype)
    db_ref[0] = jnp.swapaxes(
        jnp.concatenate(dbs, axis=2), 1, 2).astype(db_ref.dtype)
    du = jnp.concatenate(dus, axis=1)              # (bt, c, d)
    if has_d:
        dval = d_ref[0].astype(jnp.float32)
        du = du + gy * dval[None]
        dd_ref[0] += jnp.sum(gy * u, axis=(0, 1), keepdims=False)[None]
    du_ref[...] = du.astype(du_ref.dtype)
    ddt = jnp.concatenate(ddts, axis=1)
    if softplus:
        ddt = ddt * jax.nn.sigmoid(dt_pre)
    ddt = ddt * mask  # padded steps contribute nothing to dbias
    ddelta_ref[...] = ddt.astype(ddelta_ref.dtype)
    dbias_ref[0] += jnp.sum(ddt, axis=(0, 1), keepdims=False)[None]


def _pad_args(u, delta, B, C, z, g, bt, chunk, dtile):
    b, l, d = u.shape
    bp = _round_up(b, bt)
    lp, dp = _round_up(l, chunk), _round_up(d, dtile)
    pad_b, pad_l, pad_d = bp - b, lp - l, dp - d

    def pad_ld(x):
        if x is None:
            return None
        return jnp.pad(x, ((0, pad_b), (0, pad_l), (0, pad_d)))

    # B/C → group-major (G, batch, lp, n): Mosaic needs the last two block
    # dims tile-aligned, so the group axis cannot sit next to dstate
    Bp = jnp.pad(B, ((0, pad_b), (0, pad_l), (0, 0), (0, 0))).transpose(2, 0, 1, 3)
    Cp = jnp.pad(C, ((0, pad_b), (0, pad_l), (0, 0), (0, 0))).transpose(2, 0, 1, 3)
    return (pad_ld(u), pad_ld(delta), Bp, Cp, pad_ld(z), pad_ld(g), bp, lp, dp)


def _pad_params(A, D, delta_bias, dim, dp):
    At = jnp.pad(A.T.astype(jnp.float32), ((0, 0), (0, dp - dim)))  # (n, dp)
    Dp = (
        jnp.pad(D.astype(jnp.float32), (0, dp - dim))[None]
        if D is not None else jnp.zeros((1, dp), jnp.float32)
    )
    biasp = (
        jnp.pad(delta_bias.astype(jnp.float32), (0, dp - dim))[None]
        if delta_bias is not None else jnp.zeros((1, dp), jnp.float32)
    )
    return At, Dp, biasp


def _specs(bt, chunk, dtile, dstate, nchunks, has_z, reverse,
           ngroups=1, ndt=1):
    tiles_per_group = max(ndt // ngroups, 1)

    def ld(bi, di, li):
        return (bi, nchunks - 1 - li, di) if reverse else (bi, li, di)

    def ln(bi, di, li):
        g = di // tiles_per_group
        return ((g, bi, nchunks - 1 - li, 0) if reverse else (g, bi, li, 0))

    ld_spec = pl.BlockSpec((bt, chunk, dtile), ld, memory_space=pltpu.VMEM)
    ln_spec = pl.BlockSpec((1, bt, chunk, dstate), ln, memory_space=pltpu.VMEM)
    z_spec = (
        ld_spec if has_z
        else pl.BlockSpec((bt, 1, dtile), lambda bi, di, li: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    )
    a_spec = pl.BlockSpec((dstate, dtile), lambda bi, di, li: (0, di),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, dtile), lambda bi, di, li: (0, di),
                            memory_space=pltpu.VMEM)
    states_spec = pl.BlockSpec(
        (bt, 1, dstate, dtile),
        (lambda bi, di, li: (bi, nchunks - 1 - li, 0, di)) if reverse
        else (lambda bi, di, li: (bi, li, 0, di)),
        memory_space=pltpu.VMEM,
    )
    return ld_spec, ln_spec, z_spec, a_spec, vec_spec, states_spec


_COMPILER_PARAMS = dict(
    dimension_semantics=("parallel", "parallel", "arbitrary"),
)


def _pad_h0(h0, bp, dim, dstate, dp, u_dtype):
    """External (batch, dim, dstate) initial state → internal padded
    (bp, dstate, dp) fp32 (zeros when absent)."""
    if h0 is None:
        return jnp.zeros((bp, dstate, dp), jnp.float32)
    h0t = jnp.swapaxes(h0.astype(jnp.float32), 1, 2)   # (batch, dstate, dim)
    return jnp.pad(h0t, ((0, bp - h0.shape[0]), (0, 0), (0, dp - dim)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _scan_core(u, delta, A, B, C, D, z, delta_bias, h0,
               softplus: bool, chunk: int, dtile: int, interpret: bool):
    # primal path (inference / no grad trace): skip the chunk-state
    # checkpoint writes — they exist solely for the backward and cost
    # b·(l/chunk)·n·d fp32 of pure HBM write bandwidth (the CUDA fwd always
    # writes x_ptr, selective_scan.cpp:249; here the VJP fwd rule re-runs
    # with want_states=True instead)
    out, _, last = _scan_fwd_impl(
        u, delta, A, B, C, D, z, delta_bias, h0,
        softplus, chunk, dtile, interpret, want_states=False,
    )
    return out, last


def _scan_fwd_impl(u, delta, A, B, C, D, z, delta_bias, h0,
                   softplus, chunk, dtile, interpret, want_states=True,
                   reverse=False):
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    ngroups = B.shape[2]
    has_d, has_z = D is not None, z is not None
    use_hs = batch <= HS_BATCH_MAX
    assert not (reverse and use_hs), \
        "flip-free reverse is the batched-kernel path only (dispatch " \
        "routes small batches through the flip composition)"
    bt = 1 if use_hs else _batch_tile(batch, chunk, LONG_BT_ELEMS)

    up, deltap, Bp, Cp, zp, _, bp, lp, dp = _pad_args(
        u, delta, B, C, z, None, bt, chunk, dtile)
    nbt, nchunks, ndt = bp // bt, lp // chunk, dp // dtile
    At, Dp, biasp = _pad_params(A, D, delta_bias, dim, dp)
    h0p = _pad_h0(h0, bp, dim, dstate, dp, u.dtype)
    if zp is None:
        zp = jnp.zeros((bp, 1, dp), u.dtype)  # dummy, never read

    ld_spec, ln_spec, z_spec, a_spec, vec_spec, states_spec = _specs(
        bt, chunk, dtile, dstate, nchunks, has_z, reverse=reverse,
        ngroups=ngroups, ndt=ndt,
    )
    last_spec = pl.BlockSpec((bt, dstate, dtile),
                             lambda bi, di, li: (bi, 0, di),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _fwd_kernel_hs if use_hs else _fwd_kernel,
        softplus=softplus, has_d=has_d, has_z=has_z,
        nchunks=nchunks, chunk=chunk, seqlen=seqlen,
        want_states=want_states,
        **({} if use_hs else {"reverse": reverse}),
    )
    out_specs = [ld_spec] + ([states_spec] if want_states else []) + [last_spec]
    out_shape = (
        [jax.ShapeDtypeStruct((bp, lp, dp), u.dtype)]
        + ([jax.ShapeDtypeStruct((bp, nchunks, dstate, dp), jnp.float32)]
           if want_states else [])
        + [jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32)]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nbt, ndt, nchunks),
        in_specs=[ld_spec, ld_spec, a_spec, ln_spec, ln_spec, vec_spec, z_spec,
                  vec_spec, last_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(
            (dstate, dtile) if use_hs else (bt, dstate, dtile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(**_COMPILER_PARAMS),
        interpret=interpret,
    )(up, deltap, At, Bp, Cp, Dp, zp, biasp, h0p)
    out, states, last = (
        (outs[0], outs[1], outs[2]) if want_states
        else (outs[0], None, outs[1])
    )

    out = out[:batch, :seqlen, :dim]
    last_state = jnp.swapaxes(last, 1, 2)[:batch, :dim]  # (batch, dim, dstate)
    return out, states, last_state


def _scan_core_fwd(u, delta, A, B, C, D, z, delta_bias, h0,
                   softplus, chunk, dtile, interpret):
    out, states, last = _scan_fwd_impl(
        u, delta, A, B, C, D, z, delta_bias, h0,
        softplus, chunk, dtile, interpret
    )
    return (out, last), (u, delta, A, B, C, D, z, delta_bias, h0, states)


def _scan_core_bwd(softplus, chunk, dtile, interpret, residuals, cotangents):
    u, delta, A, B, C, D, z, delta_bias, h0, states = residuals
    g, g_last = cotangents  # both propagated exactly (the reference
    # SelectiveScanFn drops the last-state grad, interface.py:79-82; the
    # sequence-parallel ring needs it)

    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    has_d, has_z = D is not None, z is not None
    # the bwd holds the per-step recomputed states (chunk · bt·n·dtile fp32)
    # in VMEM — cap its batch tile independently of the fwd's
    use_hs = batch <= HS_BATCH_MAX
    bt = 1 if use_hs else _batch_tile(batch, chunk, LONG_BT_ELEMS_BWD)

    ngroups = B.shape[2]
    # g stays in its native dtype (the kernel upcasts in-VMEM): casting to
    # fp32 here doubled the cotangent's HBM read bytes under bf16 training
    up, deltap, Bp, Cp, zp, gp, bp, lp, dp = _pad_args(
        u, delta, B, C, z, g, bt, chunk, dtile
    )
    nbt, nchunks, ndt = bp // bt, lp // chunk, dp // dtile
    At, Dp, biasp = _pad_params(A, D, delta_bias, dim, dp)
    glastp = _pad_h0(g_last, bp, dim, dstate, dp, u.dtype)
    if zp is None:
        zp = jnp.zeros((bp, 1, dp), u.dtype)

    # states were checkpointed with the FWD's batch tile, whose padding can
    # be larger OR smaller than the bwd's (fwd cap 16 rows vs bwd cap 2 at
    # chunk 64): slice surplus padding rows, pad missing ones. Padding rows
    # hold garbage-free zero-init states for out-of-batch rows either way.
    if states.shape[0] > bp:
        states = states[:bp]
    elif states.shape[0] < bp:
        states = jnp.pad(states, ((0, bp - states.shape[0]),) +
                         ((0, 0),) * (states.ndim - 1))

    ld_spec, ln_spec, z_spec, a_spec, vec_spec, states_spec = _specs(
        bt, chunk, dtile, dstate, nchunks, has_z, reverse=True,
        ngroups=ngroups, ndt=ndt,
    )
    # per-batch-tile accumulators (consecutive revisits within one (bi, di))
    acc_nd = pl.BlockSpec((1, dstate, dtile), lambda bi, di, li: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    acc_vec = pl.BlockSpec((1, 1, dtile), lambda bi, di, li: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    # dB/dC are reductions over dim: each d-tile writes its own partial
    # (block index includes di — revisits across di are NOT consecutive, so
    # in-place accumulation would be overwritten); summed over di outside.
    bc_spec = pl.BlockSpec(
        (1, bt, chunk, dstate),
        lambda bi, di, li: (di, bi, nchunks - 1 - li, 0),
        memory_space=pltpu.VMEM,
    )

    glast_spec = pl.BlockSpec((bt, dstate, dtile),
                              lambda bi, di, li: (bi, 0, di),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel_hs if use_hs else _bwd_kernel,
        softplus=softplus, has_d=has_d, has_z=has_z,
        nchunks=nchunks, chunk=chunk, seqlen=seqlen,
    )
    du, ddelta, dA_bt, dB, dC, dD_b, dz, dbias_b, dh0 = pl.pallas_call(
        kernel,
        grid=(nbt, ndt, nchunks),
        in_specs=[ld_spec, ld_spec, a_spec, ln_spec, ln_spec, vec_spec, z_spec,
                  vec_spec, states_spec, ld_spec, glast_spec],
        out_specs=[ld_spec, ld_spec, acc_nd, bc_spec, bc_spec, acc_vec,
                   ld_spec, acc_vec, glast_spec],
        out_shape=[
            # du/ddelta/dz in the INPUT dtypes: they were downcast on exit
            # anyway (same final precision, half the HBM write bytes under
            # bf16); per-tile reductions stay fp32 for the cross-tile sums
            jax.ShapeDtypeStruct((bp, lp, dp), u.dtype),           # du
            jax.ShapeDtypeStruct((bp, lp, dp), delta.dtype),       # ddelta
            jax.ShapeDtypeStruct((nbt, dstate, dp), jnp.float32),  # dA parts
            jax.ShapeDtypeStruct((ndt, bp, lp, dstate), jnp.float32),  # dB per-tile
            jax.ShapeDtypeStruct((ndt, bp, lp, dstate), jnp.float32),  # dC per-tile
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dD parts
            jax.ShapeDtypeStruct((bp, lp, dp),
                                 z.dtype if has_z else jnp.float32),  # dz
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dbias parts
            jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32),  # dh0
        ],
        scratch_shapes=[pltpu.VMEM(
            (dstate, dtile) if use_hs else (bt, dstate, dtile),
            jnp.float32)],
        compiler_params=pltpu.CompilerParams(**_COMPILER_PARAMS),
        interpret=interpret,
    )(up, deltap, At, Bp, Cp, Dp, zp, biasp, states, gp, glastp)

    du = du[:batch, :seqlen, :dim].astype(u.dtype)
    ddelta = ddelta[:batch, :seqlen, :dim].astype(delta.dtype)
    dA = jnp.sum(dA_bt, axis=0)[:, :dim].T.astype(A.dtype)
    # per-tile partials (ndt, bp, lp, n) → per-group sums
    tiles_per_group = max(ndt // ngroups, 1)
    dB = dB.reshape(ngroups, tiles_per_group, bp, lp, dstate).sum(1)
    dC = dC.reshape(ngroups, tiles_per_group, bp, lp, dstate).sum(1)
    dB = dB.transpose(1, 2, 0, 3)[:batch, :seqlen].astype(B.dtype)
    dC = dC.transpose(1, 2, 0, 3)[:batch, :seqlen].astype(C.dtype)
    dD = jnp.sum(dD_b, axis=(0, 1))[:dim].astype(D.dtype) if has_d else None
    dz = dz[:batch, :seqlen, :dim].astype(z.dtype) if has_z else None
    dbias = (
        jnp.sum(dbias_b, axis=(0, 1))[:dim].astype(delta_bias.dtype)
        if delta_bias is not None else None
    )
    dh0 = (
        jnp.swapaxes(dh0, 1, 2)[:batch, :dim].astype(h0.dtype)
        if h0 is not None else None
    )
    return (du, ddelta, dA, dB, dC, dD, dz, dbias, dh0)


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def _flip(x):
    return None if x is None else jnp.flip(x, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _rev_core(u, delta, A, B, C, D, z, delta_bias, h0,
              softplus: bool, chunk: int, dtile: int, interpret: bool):
    """Anti-causal scan, (out, state at t=0). PRIMAL is the flip-free
    reverse kernel (`_fwd_kernel(reverse=True)`: reversed index maps +
    reversed in-chunk walk — the xplane of the 1M-token bidirectional
    point showed 42 ms/iter of exclusive-compute `reverse` HLOs, 15% of
    the step, benchmarks/r13-series). The TRAINING rules below reuse the
    battle-tested forward VJP on flipped operands — gradients cost the
    same as the old flip path; only inference is flip-free."""
    out, _, last = _scan_fwd_impl(
        u, delta, A, B, C, D, z, delta_bias, h0,
        softplus, chunk, dtile, interpret, want_states=False, reverse=True,
    )
    return out, last


def _rev_core_fwd(u, delta, A, B, C, D, z, delta_bias, h0,
                  softplus, chunk, dtile, interpret):
    (out, last), res = _scan_core_fwd(
        _flip(u), _flip(delta), A, _flip(B), _flip(C), D, _flip(z),
        delta_bias, h0, softplus, chunk, dtile, interpret)
    return (_flip(out), last), res


def _rev_core_bwd(softplus, chunk, dtile, interpret, residuals, cotangents):
    g, g_last = cotangents
    du, ddelta, dA, dB, dC, dD, dz, dbias, dh0 = _scan_core_bwd(
        softplus, chunk, dtile, interpret, residuals, (_flip(g), g_last))
    return (_flip(du), _flip(ddelta), dA, _flip(dB), _flip(dC), dD,
            _flip(dz), dbias, dh0)


_rev_core.defvjp(_rev_core_fwd, _rev_core_bwd)


def selective_scan_pallas(
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
    chunk: int = DEFAULT_CHUNK,
    dtile: int = DEFAULT_DTILE,
    interpret: Optional[bool] = None,
    initial_state: Optional[jax.Array] = None,
    reverse: bool = False,
):
    """Pallas production path: real A, per-step B/C — (batch, seqlen, dstate)
    or grouped (batch, seqlen, G, dstate) with each d-group's width a
    multiple of dtile (the reference kernel's grouped variable B/C,
    selective_scan_fwd_kernel.cuh BOOL_SWITCH variants). Grouping also fuses
    the two directions of bidirectional mixers into one kernel call.

    initial_state: optional (batch, dim, dstate) incoming prefix state (the
    sequence-parallel shard-chaining input); forces the chunked path, whose
    last_state is exactly differentiable (and dL/d(initial_state) flows).
    The short path's last_state stays stop_gradient'ed.

    reverse=True computes the ANTI-causal scan (h_t depends on t..L-1;
    initial_state enters at the sequence END, last_state is the state at
    t=0) == flip∘scan∘flip but WITHOUT the flip copies on the inference
    fast paths (the CUDA kernels' BlockReverseScan direction,
    reverse_scan.cuh): the segmented and batched-chunk routes run
    reversed index maps + a reversed in-chunk walk. Routes without a
    flip-free kernel (short / Hillis–Steele small-batch) and the training
    VJP fall back to the flip composition — same cost as the caller
    flipping, so `reverse=True` is never slower.
    """
    squeeze_g = False
    if B.ndim == 3:
        B = B[:, :, None]
        squeeze_g = True
    if C.ndim == 3:
        C = C[:, :, None]
    ngroups = B.shape[2]
    dim = u.shape[-1]
    if ngroups > 1 and dim % ngroups:
        raise NotImplementedError("grouped B/C needs dim divisible by G")
    if ngroups > 1:
        width = dim // ngroups
        if width % dtile:
            # shrink the d-tile to a divisor of the group width, or — for
            # widths below a lane tile — zero-pad every group's channels to
            # 128 (padded lanes carry u=0 ⇒ bu=0 ⇒ y=0: exact identities).
            # This lifts the r1 restriction that silently forced expand=1
            # DBM mixers off the fused path.
            dt_eff = dtile
            while dt_eff > 128 and width % dt_eff:
                dt_eff //= 2
            if width % dt_eff == 0:
                dtile = dt_eff
            else:
                wp = _round_up(width, 128)
                dtile = 128

                def padg(x):
                    if x is None:
                        return None
                    xg = x.reshape(x.shape[:-1] + (ngroups, width))
                    pads = [(0, 0)] * (xg.ndim - 1) + [(0, wp - width)]
                    return jnp.pad(xg, pads).reshape(
                        x.shape[:-1] + (ngroups * wp,))

                out = selective_scan_pallas(
                    padg(u), padg(delta),
                    padg(A.T).T if A.ndim == 2 else A,
                    B, C,
                    D=padg(D), z=padg(z), delta_bias=padg(delta_bias),
                    delta_softplus=delta_softplus,
                    return_last_state=return_last_state,
                    chunk=chunk, dtile=dtile, interpret=interpret,
                    initial_state=(
                        padg(initial_state.swapaxes(1, 2)).swapaxes(1, 2)
                        if initial_state is not None else None),
                    reverse=reverse,
                )
                def unpad(y):
                    yg = y.reshape(y.shape[:-1] + (ngroups, wp))
                    return yg[..., :width].reshape(y.shape[:-1] + (dim,))
                if return_last_state:
                    o, last = out
                    return unpad(o), unpad(last.swapaxes(1, 2)).swapaxes(1, 2)
                return unpad(out)
    if jnp.issubdtype(A.dtype, jnp.complexfloating):
        if reverse:
            return _rev_via_flip(
                u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                return_last_state, chunk, dtile, interpret, initial_state)
        # reference BOOL_SWITCH complex variants; real variable B/C only
        return _selective_scan_pallas_complex(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus,
            return_last_state, chunk, dtile, interpret, initial_state)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seq_padded = _round_up(u.shape[1], 8)
    if (u.shape[0] <= HS_BATCH_MAX and u.shape[1] >= SEG_MIN_SEQ
            and delta_softplus and u.shape[0] < SEG_TARGET_ROWS):
        # lane-starved huge sequence: segment-parallel two-pass route
        return _segmented_scan(
            u, delta, A, B, C, D, z, delta_bias,
            return_last_state, chunk, dtile, interpret, initial_state,
            reverse=reverse)
    if seq_padded <= SHORT_SEQ_MAX and initial_state is None:
        if reverse:  # no flip-free short kernel: compose (cost parity
            return _rev_via_flip(  # with the caller's own flips)
                u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                return_last_state, chunk, dtile, interpret, initial_state)
        # batch-tiled single-chunk path for tiny sequences (video adapters)
        bt = max(1, SHORT_BT_ELEMS // seq_padded)
        out, last = _short_core(
            u, delta, A, B, C, D, z, delta_bias,
            delta_softplus, bt, dtile, interpret,
        )
        last = lax.stop_gradient(last)
    else:
        if u.shape[0] <= HS_BATCH_MAX:
            if reverse:  # Hillis–Steele has no reverse variant either
                return _rev_via_flip(
                    u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                    return_last_state, chunk, dtile, interpret,
                    initial_state)
            chunk = min(chunk, HS_CHUNK)  # parallel in-chunk pass depth
        chunk = min(chunk, seq_padded)
        core = _rev_core if reverse else _scan_core
        out, last = core(
            u, delta, A, B, C, D, z, delta_bias, initial_state,
            delta_softplus, chunk, dtile, interpret,
        )
    if return_last_state:
        return out, last
    return out


def _rev_via_flip(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                  return_last_state, chunk, dtile, interpret, initial_state):
    """reverse=True on routes without a flip-free kernel: the plain
    flip∘scan∘flip composition (identical cost to the caller flipping)."""
    out = selective_scan_pallas(
        _flip(u), _flip(delta), A, _flip(B), _flip(C), D=D, z=_flip(z),
        delta_bias=delta_bias, delta_softplus=delta_softplus,
        return_last_state=return_last_state, chunk=chunk, dtile=dtile,
        interpret=interpret, initial_state=initial_state)
    if return_last_state:
        out, last = out
        return _flip(out), last
    return _flip(out)

def _segmented_scan(u, delta, A, B, C, D, z, delta_bias,
                    return_last_state, chunk, dtile, interpret,
                    initial_state, reverse=False):
    """Segment-parallel two-pass scan for lane-starved huge sequences.

    A batch-1 sequence gives the sequential chunk walk only (n·dtile) lanes
    of work per step and the Hillis–Steele variant only one chunk per grid
    step — both run far under the VPU roofline. This route reshapes
    (b, L, d) into (b·S, L/S, d) and runs the existing batched kernel twice:

      pass 1   local scans with h0 = 0 → per-segment last states s_i
      combine  the per-segment TOTAL decay is exp(A · Σ_t dt_t) — a cheap
               reduction, no scan needed — so the exact incoming state of
               every segment is a length-S prefix scan of
               (exp(A·Σdt_i), s_i), the same first-order pairs the kernel
               itself chains (and `parallel/ring_scan.py` passes between
               devices; this is its single-chip analogue)
      pass 2   the same batched kernel with the exact incoming states

    2× the scan work at ~10–16× the lane occupancy. Padded tail steps are
    exact identity elements (delta = -1e9 ⇒ softplus ⇒ dt = 0 ⇒ a = 1,
    b = 0), which is why the route requires delta_softplus. Both passes are
    the custom-VJP kernel, so the composition autodiffs (at ~2× the usual
    backward cost — pass 1's discarded y still runs its adjoint).

    reverse=True is the anti-causal mirror, fully flip-free: the inner
    passes run the reverse kernel, the segment decay exp(A·Σdt) is
    direction-independent, and the chaining becomes a SUFFIX scan of the
    affine maps M_i(x) = decay_i·x + s_i (composition
    M_i∘M_{i+1}∘…∘M_{S-1}: state enters at the far right); incoming_i is
    the suffix composite of segments i+1…, and the returned last_state is
    the state at t=0 (segment 0's left edge).
    """
    b, l, dim = u.shape
    squeeze_g = B.ndim == 3
    if squeeze_g:
        B, C = B[:, :, None], C[:, :, None]
    S = max(1, SEG_TARGET_ROWS // b)
    lc = _round_up(_cdiv(l, S), chunk)
    S = _cdiv(l, lc)
    lp = S * lc

    def seg(x, fill=0.0):
        if x is None:
            return None
        pads = [(0, 0), (0, lp - l)] + [(0, 0)] * (x.ndim - 2)
        xp = jnp.pad(x, pads, constant_values=fill) if lp > l else x
        return xp.reshape((b * S, lc) + x.shape[2:])

    u_r, z_r = seg(u), seg(z)
    delta_r = seg(delta, fill=-1e9)       # softplus(-1e9 + bias) == 0: the
    B_r, C_r = seg(B), seg(C)             # padded tail is an exact identity

    # per-segment summary decay from Σdt (fused reduce, nothing materialized)
    dtf = delta.astype(jnp.float32)
    if delta_bias is not None:
        dtf = dtf + delta_bias.astype(jnp.float32)
    dtf = jax.nn.softplus(dtf)
    if lp > l:
        dtf = jnp.pad(dtf, ((0, 0), (0, lp - l), (0, 0)))  # zero dt: identity
    seg_dt = dtf.reshape(b, S, lc, dim).sum(axis=2)        # (b, S, d)
    decay = jnp.exp(seg_dt[..., None] * A[None, None])     # (b, S, d, n)

    _, s_loc = selective_scan_pallas(
        u_r, delta_r, A, B_r, C_r, D=None, z=None, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=True,
        chunk=chunk, dtile=dtile, interpret=interpret,
        # explicit zero h0 forces the chunked path, whose last_state is
        # exactly differentiable (the short path stop-gradients it)
        initial_state=jnp.zeros((b * S, dim, A.shape[1]), jnp.float32),
        reverse=reverse,
    )
    s_loc = s_loc.reshape(b, S, dim, A.shape[1])

    def comb(lhs, rhs):
        # affine-map composition M_rhs ∘ M_lhs (lhs is traversed FIRST in
        # scan order — for reverse=True that's the later-in-time block;
        # the rule itself is direction-independent)
        a1, x1 = lhs
        a2, x2 = rhs
        return a1 * a2, a2 * x1 + x2

    acum, xglob = lax.associative_scan(comb, (decay, s_loc), axis=1,
                                       reverse=reverse)
    if initial_state is not None:
        h0 = initial_state.astype(jnp.float32)            # (b, d, n)
        xglob = xglob + acum * h0[:, None]
        first = h0[:, None]
    else:
        first = jnp.zeros_like(xglob[:, :1])
    if reverse:
        incoming = jnp.concatenate([xglob[:, 1:], first], axis=1)
    else:
        incoming = jnp.concatenate([first, xglob[:, :-1]], axis=1)

    out = selective_scan_pallas(
        u_r, delta_r, A, B_r, C_r, D=D, z=z_r, delta_bias=delta_bias,
        delta_softplus=True, return_last_state=False,
        chunk=chunk, dtile=dtile, interpret=interpret,
        initial_state=incoming.reshape(b * S, dim, A.shape[1]),
        reverse=reverse,
    )
    out = out.reshape(b, lp, dim)[:, :l]
    if return_last_state:
        return out, (xglob[:, 0] if reverse else xglob[:, -1])
    return out


# ---------------------------------------------------------------------------
# Short-sequence fast path
#
# Video-adapter workloads scan HUGE batches of TINY sequences (TimeMamba:
# B·n ≈ 1568 sequences of T = 16 frames). The chunked kernel's grid then
# degenerates to thousands of steps with ~16 KB blocks — DMA-latency bound at
# ~10% of HBM bandwidth. This path tiles the BATCH into each grid step
# instead: one chunk covers the whole sequence (no carried state, no
# checkpoints).
#
# The recurrence runs as a SEQUENTIAL unrolled loop over the c (≤64)
# timesteps, not a Hillis–Steele scan: per-(b,n,d) lane the sequential form
# does 2·c FMAs where the log-depth scan does 2·c·log2(c) — and with the
# batch tiled into the block, each step still fills the VPU
# (bt·n·d ≈ 32–131K lanes). This is the same work-vs-depth tradeoff the
# CUDA kernel makes per thread (selective_scan_fwd_kernel.cuh:214-248:
# sequential within a thread's items, scan only across threads). It also
# avoids materializing the (bt, c, n, d) discretized tensors.


def _short_prep(u_ref, delta_ref, b_ref, c_ref, bias_t, softplus, seqlen):
    u = u_ref[...].astype(jnp.float32)                 # (bt, c, d)
    dt_pre = delta_ref[...].astype(jnp.float32) + bias_t[None]
    dt = jax.nn.softplus(dt_pre) if softplus else dt_pre
    pos = jax.lax.broadcasted_iota(jnp.int32, dt.shape, 1)
    mask = (pos < seqlen).astype(jnp.float32)
    dt = dt * mask
    # B/C transposed ONCE to (bt, n, c): the step loop then slices the time
    # axis on LANES and broadcasts to (bt, n, d) directly — the (bt, c, n)
    # form needs a lane→sublane relayout per step per direction, which
    # dominated the step loop (measured ~25% of kernel time at c=16).
    bmat = jnp.swapaxes(b_ref[0].astype(jnp.float32), 1, 2)  # (bt, n, c)
    cmat = jnp.swapaxes(c_ref[0].astype(jnp.float32), 1, 2)  # (bt, n, c)
    return u, dt_pre, dt, mask, bmat, cmat


def _col(x, t: int):
    """x[:, :, t:t+1] for static t — a lane slice of the (bt, n, c) B/C
    layout, broadcastable straight to (bt, n, d)."""
    return jax.lax.slice_in_dim(x, t, t + 1, axis=2)


def _row1(x, t: int):
    """x[:, t] for static t (Mosaic-safe static slice)."""
    return jax.lax.squeeze(jax.lax.slice_in_dim(x, t, t + 1, axis=1), (1,))


def _short_fwd_kernel(
    u_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, z_ref, bias_ref,
    out_ref, last_ref,
    *, softplus: bool, has_d: bool, has_z: bool, seqlen: int,
):
    a_t = a_ref[...].astype(jnp.float32)               # (n, d)
    bias_t = bias_ref[0].astype(jnp.float32)           # (d,) → broadcast
    u, _, dt, _, bmat, cmat = _short_prep(
        u_ref, delta_ref, b_ref, c_ref, bias_t, softplus, seqlen)
    bt, c, d = u.shape
    n = a_t.shape[0]
    dtu = dt * u                                       # (bt, c, d)

    h = jnp.zeros((bt, n, d), jnp.float32)
    ys = []
    for t in range(c):
        a_step = jnp.exp(_row1(dt, t)[:, None, :] * a_t[None])  # (bt, n, d)
        bu = _row1(dtu, t)[:, None, :] * _col(bmat, t)
        h = a_step * h + bu
        ys.append(jnp.sum(h * _col(cmat, t), axis=1)[:, None])
    y = jnp.concatenate(ys, axis=1)                    # (bt, c, d)

    if has_d:
        y = y + u * d_ref[0].astype(jnp.float32)[None]
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        y = y * (z * jax.nn.sigmoid(z))
    out_ref[...] = y.astype(out_ref.dtype)
    last_ref[...] = h


def _short_bwd_kernel(
    u_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, z_ref, bias_ref, g_ref,
    du_ref, ddelta_ref, da_ref, db_ref, dc_ref, dd_ref, dz_ref, dbias_ref,
    *, softplus: bool, has_d: bool, has_z: bool, seqlen: int,
):
    a_t = a_ref[...].astype(jnp.float32)
    bias_t = bias_ref[0].astype(jnp.float32)
    u, dt_pre, dt, mask, bmat, cmat = _short_prep(
        u_ref, delta_ref, b_ref, c_ref, bias_t, softplus, seqlen)
    bt, c, d = u.shape
    n = a_t.shape[0]
    dtu = dt * u

    # forward recompute, keeping per-step h in VMEM/registers (c · bt·n·d
    # fp32 — the short path's whole point is c is tiny). The decay a is NOT
    # stored: it is recomputed in the reverse loop — exp costs nothing here
    # (a no-transcendental kernel variant measured SLOWER, r3 diagnostics),
    # and dropping the a list halves the bwd's VMEM so its batch tile can
    # double (VPU fill).
    h = jnp.zeros((bt, n, d), jnp.float32)
    hs = []
    for t in range(c):
        a_step = jnp.exp(_row1(dt, t)[:, None, :] * a_t[None])
        bu = _row1(dtu, t)[:, None, :] * _col(bmat, t)
        h = a_step * h + bu
        hs.append(h)

    g = g_ref[...].astype(jnp.float32)                 # (bt, c, d)
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        silu = z * sig
        ys = [jnp.sum(hs[t] * _col(cmat, t), axis=1)[:, None]
              for t in range(c)]
        y_pre = jnp.concatenate(ys, axis=1)
        if has_d:
            y_pre = y_pre + u * d_ref[0].astype(jnp.float32)[None]
        dz_ref[...] = (g * y_pre * (sig + silu * (1.0 - sig))).astype(
            dz_ref.dtype)
        gy = g * silu
    else:
        gy = g

    # reverse sequential adjoint: dh_t = C_t ⊗ gy_t + a_{t+1} · dh_{t+1}
    dh_carry = jnp.zeros((bt, n, d), jnp.float32)
    da_acc = jnp.zeros((n, d), jnp.float32)
    dcs, dbs, ddts, dus = [None] * c, [None] * c, [None] * c, [None] * c
    for t in range(c - 1, -1, -1):
        gy_t = _row1(gy, t)                            # (bt, d)
        a_step = jnp.exp(_row1(dt, t)[:, None, :] * a_t[None])  # recompute
        dh = _col(cmat, t) * gy_t[:, None, :] + dh_carry
        h_prev = hs[t - 1] if t > 0 else jnp.zeros((bt, n, d), jnp.float32)
        da_el = dh * h_prev * a_step                   # (bt, n, d)
        da_acc = da_acc + jnp.sum(da_el * _row1(dt, t)[:, None, :], axis=0)
        # dB/dC accumulated as (bt, n, 1) lane columns; transposed to the
        # (bt, c, n) output layout ONCE after the loop (not per step)
        dcs[t] = jnp.sum(gy_t[:, None, :] * hs[t], axis=2)[:, :, None]
        dbs[t] = jnp.sum(dh * _row1(dtu, t)[:, None, :], axis=2)[:, :, None]
        dh_b = jnp.sum(dh * _col(bmat, t), axis=1)     # (bt, d)
        ddts[t] = (jnp.sum(da_el * a_t[None], axis=1)
                   + dh_b * _row1(u, t))[:, None]
        dus[t] = (dh_b * _row1(dt, t))[:, None]
        dh_carry = a_step * dh

    da_ref[0] = da_acc
    dc_ref[0] = jnp.swapaxes(
        jnp.concatenate(dcs, axis=2), 1, 2).astype(dc_ref.dtype)
    db_ref[0] = jnp.swapaxes(
        jnp.concatenate(dbs, axis=2), 1, 2).astype(db_ref.dtype)
    du = jnp.concatenate(dus, axis=1)                  # (bt, c, d)
    if has_d:
        dval = d_ref[0].astype(jnp.float32)
        du = du + gy * dval[None]
        dd_ref[0] = jnp.sum(gy * u, axis=(0, 1), keepdims=False)[None]
    du_ref[...] = du.astype(du_ref.dtype)
    ddt = jnp.concatenate(ddts, axis=1)
    if softplus:
        ddt = ddt * jax.nn.sigmoid(dt_pre)
    ddt = ddt * mask
    ddelta_ref[...] = ddt.astype(ddelta_ref.dtype)
    dbias_ref[0] = jnp.sum(ddt, axis=(0, 1), keepdims=False)[None]


def _short_pad(u, delta, B, C, z, g, bt, c, dtile):
    """Pad to tile multiples, batch-leading (batch, c, dim) layout.

    (A time-leading (c, batch, dim) variant — free per-step plane slices in
    the kernel — was measured SLOWER on v5e: the host-side transposes cost
    more than the sublane-shift slices they remove.)"""
    b, l, d = u.shape
    bp = _round_up(b, bt)
    dp = _round_up(d, dtile)

    def pad3(x):
        if x is None:
            return None
        return jnp.pad(x, ((0, bp - b), (0, c - l), (0, dp - d)))

    def pad4(x):
        # → group-major (G, bp, c, n)
        return jnp.pad(
            x, ((0, bp - b), (0, c - l), (0, 0), (0, 0))
        ).transpose(2, 0, 1, 3)

    return (pad3(u), pad3(delta), pad4(B), pad4(C), pad3(z), pad3(g), bp, dp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _short_core(u, delta, A, B, C, D, z, delta_bias,
                softplus: bool, bt: int, dtile: int, interpret: bool):
    out, last = _short_fwd_impl(u, delta, A, B, C, D, z, delta_bias,
                                softplus, bt, dtile, interpret)
    return out, last


def _short_fwd_impl(u, delta, A, B, C, D, z, delta_bias,
                    softplus, bt, dtile, interpret):
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    ngroups = B.shape[2]
    has_d, has_z = D is not None, z is not None
    c = _round_up(seqlen, 8)
    up, deltap, Bp, Cp, zp, _, bp, dp = _short_pad(
        u, delta, B, C, z, None, bt, c, dtile)
    At, Dp, biasp = _pad_params(A, D, delta_bias, dim, dp)
    if zp is None:
        zp = jnp.zeros((bp, 1, dp), u.dtype)
    nbt, ndt = bp // bt, dp // dtile
    tiles_per_group = max(ndt // ngroups, 1)

    ld = pl.BlockSpec((bt, c, dtile), lambda bi, di: (bi, 0, di),
                      memory_space=pltpu.VMEM)
    ln = pl.BlockSpec((1, bt, c, dstate),
                      lambda bi, di: (di // tiles_per_group, bi, 0, 0),
                      memory_space=pltpu.VMEM)
    zs = ld if has_z else pl.BlockSpec((bt, 1, dtile),
                                       lambda bi, di: (bi, 0, di),
                                       memory_space=pltpu.VMEM)
    a_s = pl.BlockSpec((dstate, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    v_s = pl.BlockSpec((1, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    last_s = pl.BlockSpec((bt, dstate, dtile), lambda bi, di: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _short_fwd_kernel, softplus=softplus, has_d=has_d, has_z=has_z,
        seqlen=seqlen)
    out, last = pl.pallas_call(
        kernel,
        grid=(nbt, ndt),
        in_specs=[ld, ld, a_s, ln, ln, v_s, zs, v_s],
        out_specs=[ld, last_s],
        out_shape=[
            jax.ShapeDtypeStruct((bp, c, dp), u.dtype),
            jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(up, deltap, At, Bp, Cp, Dp, zp, biasp)
    return (out[:batch, :seqlen, :dim],
            jnp.swapaxes(last[:batch], 1, 2)[:, :dim])


def _short_core_fwd(u, delta, A, B, C, D, z, delta_bias,
                    softplus, bt, dtile, interpret):
    out, last = _short_fwd_impl(u, delta, A, B, C, D, z, delta_bias,
                                softplus, bt, dtile, interpret)
    return (out, last), (u, delta, A, B, C, D, z, delta_bias)


def _short_core_bwd(softplus, bt, dtile, interpret, residuals, cotangents):
    u, delta, A, B, C, D, z, delta_bias = residuals
    g, _ = cotangents
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    ngroups = B.shape[2]
    has_d, has_z = D is not None, z is not None
    c = _round_up(seqlen, 8)
    # the bwd keeps the per-step h list (c·bt·n·dtile fp32) in VMEM — cap
    # its batch tile independently of the fwd's
    bt = min(bt, max(1, SHORT_BT_ELEMS_BWD // c))
    up, deltap, Bp, Cp, zp, gp, bp, dp = _short_pad(
        u, delta, B, C, z, g, bt, c, dtile)
    At, Dp, biasp = _pad_params(A, D, delta_bias, dim, dp)
    if zp is None:
        zp = jnp.zeros((bp, 1, dp), u.dtype)
    nbt, ndt = bp // bt, dp // dtile
    tiles_per_group = max(ndt // ngroups, 1)

    ld = pl.BlockSpec((bt, c, dtile), lambda bi, di: (bi, 0, di),
                      memory_space=pltpu.VMEM)
    ln = pl.BlockSpec((1, bt, c, dstate),
                      lambda bi, di: (di // tiles_per_group, bi, 0, 0),
                      memory_space=pltpu.VMEM)
    zs = ld if has_z else pl.BlockSpec((bt, 1, dtile),
                                       lambda bi, di: (bi, 0, di),
                                       memory_space=pltpu.VMEM)
    a_s = pl.BlockSpec((dstate, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    v_s = pl.BlockSpec((1, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    # per-grid-step partials (each (bi, di) block visited exactly once)
    da_s = pl.BlockSpec((1, dstate, dtile), lambda bi, di: (bi, 0, di),
                        memory_space=pltpu.VMEM)
    dvec_s = pl.BlockSpec((1, 1, dtile), lambda bi, di: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    bc_s = pl.BlockSpec((1, bt, c, dstate), lambda bi, di: (di, bi, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _short_bwd_kernel, softplus=softplus, has_d=has_d, has_z=has_z,
        seqlen=seqlen)
    du, ddelta, dA_p, dB_p, dC_p, dD_p, dz, dbias_p = pl.pallas_call(
        kernel,
        grid=(nbt, ndt),
        in_specs=[ld, ld, a_s, ln, ln, v_s, zs, v_s, ld],
        out_specs=[ld, ld, da_s, bc_s, bc_s, dvec_s, ld, dvec_s],
        out_shape=[
            # input-dtype writes (downcast happened on exit anyway)
            jax.ShapeDtypeStruct((bp, c, dp), u.dtype),            # du
            jax.ShapeDtypeStruct((bp, c, dp), delta.dtype),        # ddelta
            jax.ShapeDtypeStruct((nbt, dstate, dp), jnp.float32),  # dA parts
            jax.ShapeDtypeStruct((ndt, bp, c, dstate), jnp.float32),  # dB
            jax.ShapeDtypeStruct((ndt, bp, c, dstate), jnp.float32),  # dC
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dD parts
            jax.ShapeDtypeStruct((bp, c, dp),
                                 z.dtype if has_z else jnp.float32),  # dz
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dbias
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the per-step h list is ~c·bt·n·dtile fp32 ≈ 22 MB at the
            # TimeMamba adapter shape (bt=16, c=16) — past the 16 MB default
            # scoped-VMEM budget; v5e has 128 MB/core so raise the cap
            # instead of halving the batch tile (VPU fill wins)
            vmem_limit_bytes=SHORT_BWD_VMEM_LIMIT if not interpret else None,
        ),
        interpret=interpret,
    )(up, deltap, At, Bp, Cp, Dp, zp, biasp, gp)

    du = du[:batch, :seqlen, :dim].astype(u.dtype)
    ddelta = ddelta[:batch, :seqlen, :dim].astype(delta.dtype)
    dA = jnp.sum(dA_p, axis=0)[:, :dim].T.astype(A.dtype)
    # per-tile partials (ndt, bp, c, n) → per-group (bp, c, G, n)
    dB_p = dB_p.reshape(ngroups, tiles_per_group, bp, c, dstate).sum(1)
    dC_p = dC_p.reshape(ngroups, tiles_per_group, bp, c, dstate).sum(1)
    dB = dB_p.transpose(1, 2, 0, 3)[:batch, :seqlen].astype(B.dtype)
    dC = dC_p.transpose(1, 2, 0, 3)[:batch, :seqlen].astype(C.dtype)
    dD = jnp.sum(dD_p, axis=(0, 1))[:dim].astype(D.dtype) if has_d else None
    dz = dz[:batch, :seqlen, :dim].astype(z.dtype) if has_z else None
    dbias = (jnp.sum(dbias_p, axis=(0, 1))[:dim].astype(delta_bias.dtype)
             if delta_bias is not None else None)
    return (du, ddelta, dA, dB, dC, dD, dz, dbias)


_short_core.defvjp(_short_core_fwd, _short_core_bwd)

SHORT_SEQ_MAX = 64  # sequences padded to ≤ this take the batch-tiled path
SHORT_BT_ELEMS = 512       # fwd batch-tile: bt = SHORT_BT_ELEMS // c
SHORT_BT_ELEMS_BWD = 128   # bwd cap (per-step h list lives in VMEM; decays
                           # are recomputed in the reverse loop). A chip
                           # sweep at the TimeMamba adapter shape (1568 rows,
                           # c=16) measured bt 4/6/8/12/16 = 4.29/4.76/3.93/
                           # 4.63/4.03 ms fwd+bwd — bt=8 wins; bigger tiles
                           # also outgrow the 16 MB default scoped VMEM.
SHORT_BIDIR_BT_ELEMS_BWD = 128  # fused-bidir bwd batch-tile cap (TWO h
                           # lists in VMEM); on-chip sweep at the TimeMamba
                           # adapter shape (1568 rows, c=16, dtile 256):
                           # cap 64/128/256 → see benchmarks/r5_bidir_bwd.py
SHORT_BWD_VMEM_LIMIT = 64 * 1024 * 1024  # scoped-VMEM headroom so seqlens
                           # whose c doesn't divide the cap cleanly (bt
                           # rounding up the h-list footprint) still compile


# ---------------------------------------------------------------------------
# Fused BIDIRECTIONAL short path
#
# Bidirectional mixers (ViM/DBM — every suite model) run one causal and one
# anti-causal scan per layer. The short kernel is per-step latency-bound
# (halving the per-step element count barely changes its time), so running
# BOTH directions' independent recurrences inside the same step loop costs
# ~1.2x one direction instead of 2x — and the anti-causal direction scans
# backwards in place, eliminating the host-side flip copies entirely.
# Direction b's semantics are exactly flip(scan(flip(inputs))).


def _short_bidir_fwd_kernel(
    uf_ref, dtf_ref, af_ref, bf_ref, cf_ref, df_ref, zf_ref, biasf_ref,
    ub_ref, dtb_ref, ab_ref, bb_ref, cb_ref, db_ref, zb_ref, biasb_ref,
    outf_ref, outb_ref,
    *, softplus: bool, has_d: bool, has_z: bool, seqlen: int,
):
    af_t = af_ref[...].astype(jnp.float32)             # (n, d)
    ab_t = ab_ref[...].astype(jnp.float32)
    uf, _, dtf, _, bfm, cfm = _short_prep(
        uf_ref, dtf_ref, bf_ref, cf_ref,
        biasf_ref[0].astype(jnp.float32), softplus, seqlen)
    ub, _, dtb, _, bbm, cbm = _short_prep(
        ub_ref, dtb_ref, bb_ref, cb_ref,
        biasb_ref[0].astype(jnp.float32), softplus, seqlen)
    bt, c, d = uf.shape
    n = af_t.shape[0]
    dtuf = dtf * uf
    dtub = dtb * ub

    hf = jnp.zeros((bt, n, d), jnp.float32)
    hb = jnp.zeros((bt, n, d), jnp.float32)
    ysf = [None] * c
    ysb = [None] * c
    for i in range(c):
        tf, tb = i, c - 1 - i
        a_f = jnp.exp(_row1(dtf, tf)[:, None, :] * af_t[None])
        a_b = jnp.exp(_row1(dtb, tb)[:, None, :] * ab_t[None])
        bu_f = _row1(dtuf, tf)[:, None, :] * _col(bfm, tf)
        bu_b = _row1(dtub, tb)[:, None, :] * _col(bbm, tb)
        hf = a_f * hf + bu_f
        hb = a_b * hb + bu_b
        ysf[tf] = jnp.sum(hf * _col(cfm, tf), axis=1)[:, None]
        ysb[tb] = jnp.sum(hb * _col(cbm, tb), axis=1)[:, None]
    yf = jnp.concatenate(ysf, axis=1)
    yb = jnp.concatenate(ysb, axis=1)

    if has_d:
        yf = yf + uf * df_ref[0].astype(jnp.float32)[None]
        yb = yb + ub * db_ref[0].astype(jnp.float32)[None]
    if has_z:
        zf = zf_ref[...].astype(jnp.float32)
        zb = zb_ref[...].astype(jnp.float32)
        yf = yf * (zf * jax.nn.sigmoid(zf))
        yb = yb * (zb * jax.nn.sigmoid(zb))
    outf_ref[...] = yf.astype(outf_ref.dtype)
    outb_ref[...] = yb.astype(outb_ref.dtype)


def _short_bidir_bwd_kernel(
    uf_ref, dtf_ref, af_ref, bf_ref, cf_ref, df_ref, zf_ref, biasf_ref,
    gf_ref,
    ub_ref, dtb_ref, ab_ref, bb_ref, cb_ref, db_ref, zb_ref, biasb_ref,
    gb_ref,
    duf_ref, ddtf_ref, daf_ref, dbf_ref, dcf_ref, ddf_ref, dzf_ref,
    dbiasf_ref,
    dub_ref, ddtb_ref, dab_ref, dbb_ref, dcb_ref, ddb_ref, dzb_ref,
    dbiasb_ref,
    *, softplus: bool, has_d: bool, has_z: bool, seqlen: int,
):
    """Adjoint of BOTH directions in one step loop (the bwd mirror of
    _short_bidir_fwd_kernel). Direction b is flip∘scan∘flip; instead of
    materializing flips, it runs in its flipped frame in place: loop
    position i touches direction f at time i and direction b at time
    c-1-i, in both the forward state recompute and the reverse adjoint
    walk. Interleaving the two independent recurrences fills the VPU the
    same way the fused fwd does (~1.2x one direction instead of 2x), and
    all twelve host-side flip copies of the unfused path disappear.
    Reference: the CUDA bwd walks one direction per launch
    (selective_scan_bwd_kernel.cuh:141-146); the bidirectional mixers there
    pay two launches + flip copies (mamba_simple.py:228-260)."""
    af_t = af_ref[...].astype(jnp.float32)
    ab_t = ab_ref[...].astype(jnp.float32)
    uf, dtf_pre, dtf, maskf, bfm, cfm = _short_prep(
        uf_ref, dtf_ref, bf_ref, cf_ref,
        biasf_ref[0].astype(jnp.float32), softplus, seqlen)
    ub, dtb_pre, dtb, maskb, bbm, cbm = _short_prep(
        ub_ref, dtb_ref, bb_ref, cb_ref,
        biasb_ref[0].astype(jnp.float32), softplus, seqlen)
    bt, c, d = uf.shape
    n = af_t.shape[0]
    dtuf = dtf * uf
    dtub = dtb * ub

    # forward state recompute, both directions interleaved; hs*[i] is the
    # state at loop position i (direction b: actual time c-1-i)
    hf = jnp.zeros((bt, n, d), jnp.float32)
    hb = jnp.zeros((bt, n, d), jnp.float32)
    hsf, hsb = [], []
    for i in range(c):
        tf, tb = i, c - 1 - i
        af_step = jnp.exp(_row1(dtf, tf)[:, None, :] * af_t[None])
        ab_step = jnp.exp(_row1(dtb, tb)[:, None, :] * ab_t[None])
        hf = af_step * hf + _row1(dtuf, tf)[:, None, :] * _col(bfm, tf)
        hb = ab_step * hb + _row1(dtub, tb)[:, None, :] * _col(bbm, tb)
        hsf.append(hf)
        hsb.append(hb)

    gf = gf_ref[...].astype(jnp.float32)
    gb = gb_ref[...].astype(jnp.float32)

    def gate_bwd(g, z_ref_, dz_ref_, u, dval_ref, hs, cm, actual):
        if not has_z:
            return g
        z = z_ref_[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        silu = z * sig
        ys = [None] * c
        for i in range(c):
            t = actual(i)
            ys[t] = jnp.sum(hs[i] * _col(cm, t), axis=1)[:, None]
        y_pre = jnp.concatenate(ys, axis=1)
        if has_d:
            y_pre = y_pre + u * dval_ref[0].astype(jnp.float32)[None]
        dz_ref_[...] = (g * y_pre * (sig + silu * (1.0 - sig))).astype(
            dz_ref_.dtype)
        return g * silu

    gyf = gate_bwd(gf, zf_ref, dzf_ref, uf, df_ref, hsf, cfm, lambda i: i)
    gyb = gate_bwd(gb, zb_ref, dzb_ref, ub, db_ref, hsb, cbm,
                   lambda i: c - 1 - i)

    # reverse adjoint walk, interleaved (see _short_bwd_kernel for the
    # single-direction derivation)
    dhf = jnp.zeros((bt, n, d), jnp.float32)
    dhb = jnp.zeros((bt, n, d), jnp.float32)
    daf_acc = jnp.zeros((n, d), jnp.float32)
    dab_acc = jnp.zeros((n, d), jnp.float32)
    dcsf, dbsf = [None] * c, [None] * c
    ddtsf, dusf = [None] * c, [None] * c
    dcsb, dbsb = [None] * c, [None] * c
    ddtsb, dusb = [None] * c, [None] * c
    zero_h = jnp.zeros((bt, n, d), jnp.float32)
    for i in range(c - 1, -1, -1):
        tf, tb = i, c - 1 - i
        gyf_t = _row1(gyf, tf)
        af_step = jnp.exp(_row1(dtf, tf)[:, None, :] * af_t[None])
        dhf = _col(cfm, tf) * gyf_t[:, None, :] + dhf
        hf_prev = hsf[i - 1] if i > 0 else zero_h
        daf_el = dhf * hf_prev * af_step
        daf_acc = daf_acc + jnp.sum(
            daf_el * _row1(dtf, tf)[:, None, :], axis=0)
        dcsf[tf] = jnp.sum(gyf_t[:, None, :] * hsf[i], axis=2)[:, :, None]
        dbsf[tf] = jnp.sum(
            dhf * _row1(dtuf, tf)[:, None, :], axis=2)[:, :, None]
        dhf_b = jnp.sum(dhf * _col(bfm, tf), axis=1)
        ddtsf[tf] = (jnp.sum(daf_el * af_t[None], axis=1)
                     + dhf_b * _row1(uf, tf))[:, None]
        dusf[tf] = (dhf_b * _row1(dtf, tf))[:, None]
        dhf = af_step * dhf

        gyb_t = _row1(gyb, tb)
        ab_step = jnp.exp(_row1(dtb, tb)[:, None, :] * ab_t[None])
        dhb = _col(cbm, tb) * gyb_t[:, None, :] + dhb
        hb_prev = hsb[i - 1] if i > 0 else zero_h
        dab_el = dhb * hb_prev * ab_step
        dab_acc = dab_acc + jnp.sum(
            dab_el * _row1(dtb, tb)[:, None, :], axis=0)
        dcsb[tb] = jnp.sum(gyb_t[:, None, :] * hsb[i], axis=2)[:, :, None]
        dbsb[tb] = jnp.sum(
            dhb * _row1(dtub, tb)[:, None, :], axis=2)[:, :, None]
        dhb_b = jnp.sum(dhb * _col(bbm, tb), axis=1)
        ddtsb[tb] = (jnp.sum(dab_el * ab_t[None], axis=1)
                     + dhb_b * _row1(ub, tb))[:, None]
        dusb[tb] = (dhb_b * _row1(dtb, tb))[:, None]
        dhb = ab_step * dhb

    def epilogue(da_ref_, dc_ref_, db_ref_, du_ref_, ddt_ref_, dd_ref_,
                 dbias_ref_, da_acc, dcs, dbs, dus, ddts, gy, u, dval_ref,
                 dt_pre, mask):
        da_ref_[0] = da_acc
        dc_ref_[0] = jnp.swapaxes(
            jnp.concatenate(dcs, axis=2), 1, 2).astype(dc_ref_.dtype)
        db_ref_[0] = jnp.swapaxes(
            jnp.concatenate(dbs, axis=2), 1, 2).astype(db_ref_.dtype)
        du = jnp.concatenate(dus, axis=1)
        if has_d:
            dval = dval_ref[0].astype(jnp.float32)
            du = du + gy * dval[None]
            dd_ref_[0] = jnp.sum(gy * u, axis=(0, 1), keepdims=False)[None]
        du_ref_[...] = du.astype(du_ref_.dtype)
        ddt = jnp.concatenate(ddts, axis=1)
        if softplus:
            ddt = ddt * jax.nn.sigmoid(dt_pre)
        ddt = ddt * mask
        ddt_ref_[...] = ddt.astype(ddt_ref_.dtype)
        dbias_ref_[0] = jnp.sum(ddt, axis=(0, 1), keepdims=False)[None]

    epilogue(daf_ref, dcf_ref, dbf_ref, duf_ref, ddtf_ref, ddf_ref,
             dbiasf_ref, daf_acc, dcsf, dbsf, dusf, ddtsf, gyf, uf, df_ref,
             dtf_pre, maskf)
    epilogue(dab_ref, dcb_ref, dbb_ref, dub_ref, ddtb_ref, ddb_ref,
             dbiasb_ref, dab_acc, dcsb, dbsb, dusb, ddtsb, gyb, ub, db_ref,
             dtb_pre, maskb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19))
def _short_bidir_core(uf, dtf, Af, Bf, Cf, Df, zf, biasf,
                      ub, dtb, Ab, Bb, Cb, Db, zb, biasb,
                      softplus: bool, bt: int, dtile: int, interpret: bool):
    return _short_bidir_fwd_impl(
        uf, dtf, Af, Bf, Cf, Df, zf, biasf,
        ub, dtb, Ab, Bb, Cb, Db, zb, biasb,
        softplus, bt, dtile, interpret)


def _short_bidir_fwd_impl(uf, dtf, Af, Bf, Cf, Df, zf, biasf,
                          ub, dtb, Ab, Bb, Cb, Db, zb, biasb,
                          softplus, bt, dtile, interpret):
    batch, seqlen, dim = uf.shape
    dstate = Af.shape[1]
    has_d, has_z = Df is not None, zf is not None
    c = _round_up(seqlen, 8)

    def prep(u, dt, A, B, C, D, z, bias):
        up, dtp, Bp, Cp, zp, _, bp, dp = _short_pad(
            u, dt, B[:, :, None] if B.ndim == 3 else B,
            C[:, :, None] if C.ndim == 3 else C, z, None, bt, c, dtile)
        At, Dp, biasp = _pad_params(A, D, bias, dim, dp)
        if zp is None:
            zp = jnp.zeros((bp, 1, dp), u.dtype)
        return up, dtp, At, Bp, Cp, Dp, zp, biasp, bp, dp

    upf, dtpf, Atf, Bpf, Cpf, Dpf, zpf, biaspf, bp, dp = prep(
        uf, dtf, Af, Bf, Cf, Df, zf, biasf)
    upb, dtpb, Atb, Bpb, Cpb, Dpb, zpb, biaspb, _, _ = prep(
        ub, dtb, Ab, Bb, Cb, Db, zb, biasb)
    nbt, ndt = bp // bt, dp // dtile

    ld = pl.BlockSpec((bt, c, dtile), lambda bi, di: (bi, 0, di),
                      memory_space=pltpu.VMEM)
    ln = pl.BlockSpec((1, bt, c, dstate), lambda bi, di: (0, bi, 0, 0),
                      memory_space=pltpu.VMEM)
    zs = ld if has_z else pl.BlockSpec((bt, 1, dtile),
                                       lambda bi, di: (bi, 0, di),
                                       memory_space=pltpu.VMEM)
    a_s = pl.BlockSpec((dstate, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    v_s = pl.BlockSpec((1, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _short_bidir_fwd_kernel, softplus=softplus, has_d=has_d,
        has_z=has_z, seqlen=seqlen)
    outf, outb = pl.pallas_call(
        kernel,
        grid=(nbt, ndt),
        in_specs=[ld, ld, a_s, ln, ln, v_s, zs, v_s,
                  ld, ld, a_s, ln, ln, v_s, zs, v_s],
        out_specs=[ld, ld],
        out_shape=[
            jax.ShapeDtypeStruct((bp, c, dp), uf.dtype),
            jax.ShapeDtypeStruct((bp, c, dp), uf.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(upf, dtpf, Atf, Bpf, Cpf, Dpf, zpf, biaspf,
      upb, dtpb, Atb, Bpb, Cpb, Dpb, zpb, biaspb)
    return (outf[:batch, :seqlen, :dim], outb[:batch, :seqlen, :dim])


def _short_bidir_core_fwd(uf, dtf, Af, Bf, Cf, Df, zf, biasf,
                          ub, dtb, Ab, Bb, Cb, Db, zb, biasb,
                          softplus, bt, dtile, interpret):
    outs = _short_bidir_fwd_impl(
        uf, dtf, Af, Bf, Cf, Df, zf, biasf,
        ub, dtb, Ab, Bb, Cb, Db, zb, biasb, softplus, bt, dtile, interpret)
    return outs, (uf, dtf, Af, Bf, Cf, Df, zf, biasf,
                  ub, dtb, Ab, Bb, Cb, Db, zb, biasb)


def _short_bidir_core_bwd(softplus, bt, dtile, interpret, res, cot):
    """Fused adjoint: ONE kernel for both directions, zero flips.

    Measured on-chip (TimeMamba-B train step): the unfused path paid two
    31.3 ms single-direction bwd kernel sweeps + ~8 ms of flip copies per
    step; the fused kernel interleaves both adjoint recurrences in one
    loop. Multi-group B/C falls back to the flip path (the fused kernel's
    block specs assume one group, which is all the bidir entry accepts)."""
    (uf, dtf, Af, Bf, Cf, Df, zf, biasf,
     ub, dtb, Ab, Bb, Cb, Db, zb, biasb) = res
    gf, gb = cot
    single_group = ((Bf.ndim == 3 or Bf.shape[2] == 1)
                    and (Bb.ndim == 3 or Bb.shape[2] == 1))
    if single_group:
        return _short_bidir_bwd_impl(
            softplus, bt, dtile, interpret, res, (gf, gb))
    return _short_bidir_core_bwd_flip(
        softplus, bt, dtile, interpret, res, (gf, gb))


def _short_bidir_bwd_impl(softplus, bt, dtile, interpret, res, cot):
    (uf, dtf, Af, Bf, Cf, Df, zf, biasf,
     ub, dtb, Ab, Bb, Cb, Db, zb, biasb) = res
    gf, gb = cot
    batch, seqlen, dim = uf.shape
    dstate = Af.shape[1]
    has_d, has_z = Df is not None, zf is not None
    c = _round_up(seqlen, 8)
    # TWO per-step h lists live in VMEM — cap the batch tile (swept
    # on-chip at the TimeMamba adapter shape; see the constant below)
    bt = min(bt, max(1, SHORT_BIDIR_BT_ELEMS_BWD // c))

    def prep(u, dt, A, B, C, D, z, bias, g):
        B4 = B[:, :, None] if B.ndim == 3 else B
        C4 = C[:, :, None] if C.ndim == 3 else C
        up, dtp, Bp, Cp, zp, gp, bp, dp = _short_pad(
            u, dt, B4, C4, z, g, bt, c, dtile)
        At, Dp, biasp = _pad_params(A, D, bias, dim, dp)
        if zp is None:
            zp = jnp.zeros((bp, 1, dp), u.dtype)
        return up, dtp, At, Bp, Cp, Dp, zp, biasp, gp, bp, dp

    upf, dtpf, Atf, Bpf, Cpf, Dpf, zpf, biaspf, gpf, bp, dp = prep(
        uf, dtf, Af, Bf, Cf, Df, zf, biasf, gf)
    upb, dtpb, Atb, Bpb, Cpb, Dpb, zpb, biaspb, gpb, _, _ = prep(
        ub, dtb, Ab, Bb, Cb, Db, zb, biasb, gb)
    nbt, ndt = bp // bt, dp // dtile

    ld = pl.BlockSpec((bt, c, dtile), lambda bi, di: (bi, 0, di),
                      memory_space=pltpu.VMEM)
    ln = pl.BlockSpec((1, bt, c, dstate), lambda bi, di: (0, bi, 0, 0),
                      memory_space=pltpu.VMEM)
    zs = ld if has_z else pl.BlockSpec((bt, 1, dtile),
                                       lambda bi, di: (bi, 0, di),
                                       memory_space=pltpu.VMEM)
    a_s = pl.BlockSpec((dstate, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    v_s = pl.BlockSpec((1, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    da_s = pl.BlockSpec((1, dstate, dtile), lambda bi, di: (bi, 0, di),
                        memory_space=pltpu.VMEM)
    dvec_s = pl.BlockSpec((1, 1, dtile), lambda bi, di: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    bc_s = pl.BlockSpec((1, bt, c, dstate), lambda bi, di: (di, bi, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _short_bidir_bwd_kernel, softplus=softplus, has_d=has_d,
        has_z=has_z, seqlen=seqlen)

    def shapes(u, dt, z):
        return [
            jax.ShapeDtypeStruct((bp, c, dp), u.dtype),            # du
            jax.ShapeDtypeStruct((bp, c, dp), dt.dtype),           # ddelta
            jax.ShapeDtypeStruct((nbt, dstate, dp), jnp.float32),  # dA parts
            jax.ShapeDtypeStruct((ndt, bp, c, dstate), jnp.float32),  # dB
            jax.ShapeDtypeStruct((ndt, bp, c, dstate), jnp.float32),  # dC
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dD parts
            jax.ShapeDtypeStruct((bp, c, dp),
                                 z.dtype if has_z else jnp.float32),  # dz
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dbias
        ]

    out_specs_one = [ld, ld, da_s, bc_s, bc_s, dvec_s, ld, dvec_s]
    outs = pl.pallas_call(
        kernel,
        grid=(nbt, ndt),
        in_specs=[ld, ld, a_s, ln, ln, v_s, zs, v_s, ld] * 2,
        out_specs=out_specs_one * 2,
        out_shape=shapes(uf, dtf, zf) + shapes(ub, dtb, zb),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=SHORT_BWD_VMEM_LIMIT if not interpret else None,
        ),
        interpret=interpret,
    )(upf, dtpf, Atf, Bpf, Cpf, Dpf, zpf, biaspf, gpf,
      upb, dtpb, Atb, Bpb, Cpb, Dpb, zpb, biaspb, gpb)

    def reduce_one(outs8, u, dt, A, B, C, D, z, bias):
        du, ddelta, dA_p, dB_p, dC_p, dD_p, dz, dbias_p = outs8
        du = du[:batch, :seqlen, :dim].astype(u.dtype)
        ddelta = ddelta[:batch, :seqlen, :dim].astype(dt.dtype)
        dA = jnp.sum(dA_p, axis=0)[:, :dim].T.astype(A.dtype)
        dB = jnp.sum(dB_p, axis=0)[:batch, :seqlen].astype(B.dtype)
        dC = jnp.sum(dC_p, axis=0)[:batch, :seqlen].astype(C.dtype)
        if B.ndim == 4:
            dB, dC = dB[:, :, None], dC[:, :, None]
        dD = (jnp.sum(dD_p, axis=(0, 1))[:dim].astype(D.dtype)
              if has_d else None)
        dz = dz[:batch, :seqlen, :dim].astype(z.dtype) if has_z else None
        dbias = (jnp.sum(dbias_p, axis=(0, 1))[:dim].astype(bias.dtype)
                 if bias is not None else None)
        return du, ddelta, dA, dB, dC, dD, dz, dbias

    grads_f = reduce_one(outs[:8], uf, dtf, Af, Bf, Cf, Df, zf, biasf)
    grads_b = reduce_one(outs[8:], ub, dtb, Ab, Bb, Cb, Db, zb, biasb)
    return grads_f + grads_b


def _short_bidir_core_bwd_flip(softplus, bt, dtile, interpret, res, cot):
    """Per-direction adjoints via the single-direction bwd kernel: direction
    b == flip∘scan∘flip, so its grads are the flipped single-direction grads
    of the flipped inputs (host flips only on the training path). Fallback
    for grouped B/C; the fused kernel above is the production path."""
    (uf, dtf, Af, Bf, Cf, Df, zf, biasf,
     ub, dtb, Ab, Bb, Cb, Db, zb, biasb) = res
    gf, gb = cot
    Bf4 = Bf[:, :, None] if Bf.ndim == 3 else Bf
    Cf4 = Cf[:, :, None] if Cf.ndim == 3 else Cf
    Bb4 = Bb[:, :, None] if Bb.ndim == 3 else Bb
    Cb4 = Cb[:, :, None] if Cb.ndim == 3 else Cb

    grads_f = _short_core_bwd(
        softplus, bt, dtile, interpret,
        (uf, dtf, Af, Bf4, Cf4, Df, zf, biasf), (gf, None))

    flip = lambda x: jnp.flip(x, axis=1) if x is not None else None  # noqa: E731
    grads_b = _short_core_bwd(
        softplus, bt, dtile, interpret,
        (flip(ub), flip(dtb), Ab, flip(Bb4), flip(Cb4), Db, flip(zb), biasb),
        (flip(gb), None))
    du_b, ddt_b, dA_b, dB_b, dC_b, dD_b, dz_b, dbias_b = grads_b
    du_f, ddt_f, dA_f, dB_f, dC_f, dD_f, dz_f, dbias_f = grads_f

    def unflip_bc(x, orig):
        x = flip(x)
        return x[:, :, 0] if orig.ndim == 3 else x

    return (du_f, ddt_f, dA_f,
            dB_f[:, :, 0] if Bf.ndim == 3 else dB_f,
            dC_f[:, :, 0] if Cf.ndim == 3 else dC_f,
            dD_f, dz_f, dbias_f,
            flip(du_b), flip(ddt_b), dA_b,
            unflip_bc(dB_b, Bb), unflip_bc(dC_b, Cb),
            dD_b, flip(dz_b), dbias_b)


_short_bidir_core.defvjp(_short_bidir_core_fwd, _short_bidir_core_bwd)


def selective_scan_pallas_bidir(
    uf, dtf, Af, Bf, Cf, ub, dtb, Ab, Bb, Cb,
    Df=None, zf=None, biasf=None, Db=None, zb=None, biasb=None,
    delta_softplus: bool = True,
    dtile: int = DEFAULT_DTILE,
    interpret: Optional[bool] = None,
):
    """Both directions of a bidirectional mixer in ONE short-path kernel.

    All inputs are in FORWARD time order; direction b is scanned
    anti-causally in-kernel (== flip→scan→flip). Returns (out_f, out_b),
    both forward-ordered. Requires the short-path regime (seqlen ≤
    SHORT_SEQ_MAX) and rank-3 B/C; callers fall back to two
    selective_scan_pallas calls otherwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seq_padded = _round_up(uf.shape[1], 8)
    if seq_padded > SHORT_SEQ_MAX:
        raise ValueError("bidir fused path is short-sequence only")
    # both directions' blocks live in VMEM at once — scale the batch tile
    # down for wider dtypes (fp32 inputs would exceed the 16 MB VMEM at the
    # bf16-tuned tile)
    itemsize = jnp.dtype(uf.dtype).itemsize
    bt = max(1, SHORT_BT_ELEMS * 2 // (seq_padded * max(itemsize, 2)))
    return _short_bidir_core(
        uf, dtf, Af, Bf, Cf, Df, zf, biasf,
        ub, dtb, Ab, Bb, Cb, Db, zb, biasb,
        delta_softplus, bt, dtile, interpret)


# ---------------------------------------------------------------------------
# Complex-A path
#
# The reference kernel dispatches real AND complex A (BOOL_SWITCH variants,
# /root/reference/mamba/csrc/selective_scan/selective_scan.cpp:310-330, with
# selective_scan_fwd_{fp32,fp16,bf16} real/complex stubs). Mosaic has no
# complex dtype, so the recurrence runs in two REAL channels:
#
# NB: the tunneled `axon` TPU runtime in this environment has NO complex64
# support at all (device transfer and even eager `x*(1+1j)` raise
# UNIMPLEMENTED), so on-chip execution is blocked at the API boundary (the
# complex A argument / complex last_state) by the platform — the kernel
# itself touches only real tensors and is exactness-verified against the
# complex reference in interpret mode (test_pallas_complex_a).
#   a = exp(dt·Ar)·(cos(dt·Ai) + i·sin(dt·Ai))
#   hr' = Re(a)·hr − Im(a)·hi + dt·B·u      (B, C, u real)
#   hi' = Im(a)·hr + Re(a)·hi
#   y_t = 2 · Σ_n C_t,n · hr                (the reference's `y.real * 2`)
# Training gradients run the SAME reverse chunk walk as the real path
# (_cbwd_kernel: per-chunk state recompute from two-channel checkpoints +
# the sequential adjoint dh_{t-1} = conj(a)·dh_t with exact dh0/last-state
# cotangents) — the two-channel analogue of the reference's complex bwd
# dispatch (selective_scan_bwd_kernel.cuh complex stubs, selective_scan.cpp
# :310-330). No Hillis–Steele small-batch complex variant: complex A has no
# in-tree training user and the axon platform blocks on-chip complex at the
# API boundary anyway, so the sequential kernel covers every batch size.


def _cfwd_kernel(
    u_ref, delta_ref, ar_ref, ai_ref, b_ref, c_ref, d_ref, z_ref, bias_ref,
    h0r_ref, h0i_ref,
    out_ref, *rest,
    softplus: bool, has_d: bool, has_z: bool, nchunks: int,
    chunk: int, seqlen: int, want_states: bool = False,
):
    if want_states:
        (statesr_ref, statesi_ref, lastr_ref, lasti_ref,
         hr_carry, hi_carry) = rest
    else:
        (lastr_ref, lasti_ref, hr_carry, hi_carry) = rest
        statesr_ref = statesi_ref = None
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        # zeros normally; an incoming complex prefix when the caller chains
        # shards (sequence parallelism) — same contract as the real kernel
        hr_carry[...] = h0r_ref[...]
        hi_carry[...] = h0i_ref[...]

    ar_t = ar_ref[...].astype(jnp.float32)         # (n, d) Re(A) tile
    ai_t = ai_ref[...].astype(jnp.float32)         # (n, d) Im(A) tile
    bias_t = bias_ref[0].astype(jnp.float32)
    u, _, dt, _, bmat, cmat = _chunk_prep(
        u_ref, delta_ref, b_ref, c_ref, bias_t, softplus, li, chunk, seqlen)
    bt, c, d = u.shape
    dtu = dt * u

    hr = hr_carry[...]                             # (bt, n, d)
    hi = hi_carry[...]
    if want_states:
        # chunk-initial checkpoints for the bwd (x_ptr analogue), one per
        # channel
        statesr_ref[...] = hr[:, None]
        statesi_ref[...] = hi[:, None]
    ys = [None] * c
    for t in range(c):
        dt_t = _row1(dt, t)[:, None, :]
        mag = jnp.exp(dt_t * ar_t[None])
        ang = dt_t * ai_t[None]
        car = mag * jnp.cos(ang)
        cai = mag * jnp.sin(ang)
        bu = _row1(dtu, t)[:, None, :] * _col(bmat, t)
        hr_new = car * hr - cai * hi + bu
        hi = cai * hr + car * hi
        hr = hr_new
        ys[t] = 2.0 * jnp.sum(hr * _col(cmat, t), axis=1)[:, None]
    y = jnp.concatenate(ys, axis=1)                # (bt, c, d)

    if has_d:
        y = y + u * d_ref[0].astype(jnp.float32)[None]
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        y = y * (z * jax.nn.sigmoid(z))
    out_ref[...] = y.astype(out_ref.dtype)
    hr_carry[...] = hr
    hi_carry[...] = hi

    @pl.when(li == nchunks - 1)
    def _():
        lastr_ref[...] = hr
        lasti_ref[...] = hi


def _cbwd_kernel(
    u_ref, delta_ref, ar_ref, ai_ref, b_ref, c_ref, d_ref, z_ref, bias_ref,
    statesr_ref, statesi_ref, g_ref, glastr_ref, glasti_ref,
    du_ref, ddelta_ref, dar_ref, dai_ref, db_ref, dc_ref, dd_ref, dz_ref,
    dbias_ref, dh0r_ref, dh0i_ref,
    dhr_carry, dhi_carry,
    *, softplus: bool, has_d: bool, has_z: bool, nchunks: int,
    chunk: int, seqlen: int,
):
    """Complex-A reverse chunk walk, the two-real-channel mirror of
    _bwd_kernel: recompute the in-chunk forward (hr, hi) trajectories from
    the checkpointed chunk-initial states, then run the adjoint recurrence
    dh_{t-1} = conj(a)·dh_t backwards, carrying the complex cross-chunk
    cotangent as two VMEM scratch channels. Exact dh0/last-state
    cotangents, like the real kernel."""
    li = pl.program_id(2)  # index maps reverse it: li=0 is the LAST chunk

    @pl.when(li == 0)
    def _():
        dhr_carry[...] = glastr_ref[...]
        dhi_carry[...] = glasti_ref[...]
        dar_ref[0] = jnp.zeros_like(dar_ref[0])
        dai_ref[0] = jnp.zeros_like(dai_ref[0])
        dd_ref[0] = jnp.zeros_like(dd_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    ar_t = ar_ref[...].astype(jnp.float32)
    ai_t = ai_ref[...].astype(jnp.float32)
    bias_t = bias_ref[0].astype(jnp.float32)
    u, dt_pre, dt, mask, bmat, cmat = _chunk_prep(
        u_ref, delta_ref, b_ref, c_ref, bias_t, softplus,
        nchunks - 1 - li, chunk, seqlen)
    bt, c, d = u.shape
    n = ar_t.shape[0]
    dtu = dt * u

    # forward recompute from the two-channel chunk-initial checkpoint
    h0r = statesr_ref[...][:, 0]                   # (bt, n, d)
    h0i = statesi_ref[...][:, 0]
    hr, hi = h0r, h0i
    hrs, his = [None] * c, [None] * c
    for t in range(c):
        dt_t = _row1(dt, t)[:, None, :]
        mag = jnp.exp(dt_t * ar_t[None])
        ang = dt_t * ai_t[None]
        car = mag * jnp.cos(ang)
        cai = mag * jnp.sin(ang)
        bu = _row1(dtu, t)[:, None, :] * _col(bmat, t)
        hr_new = car * hr - cai * hi + bu
        hi = cai * hr + car * hi
        hr = hr_new
        hrs[t], his[t] = hr, hi

    g = g_ref[...].astype(jnp.float32)             # (bt, c, d) dL/dout
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        silu = z * sig
        ys = [2.0 * jnp.sum(hrs[t] * _col(cmat, t), axis=1)[:, None]
              for t in range(c)]
        y_pre = jnp.concatenate(ys, axis=1)
        if has_d:
            y_pre = y_pre + u * d_ref[0].astype(jnp.float32)[None]
        dz_ref[...] = (g * y_pre * (sig + silu * (1.0 - sig))).astype(
            dz_ref.dtype)
        gy = g * silu                              # grad w.r.t. pre-gate y
    else:
        gy = g

    dhr = dhr_carry[...]                           # (bt, n, d) ×2 channels
    dhi = dhi_carry[...]
    dar_acc = jnp.zeros((n, d), jnp.float32)
    dai_acc = jnp.zeros((n, d), jnp.float32)
    dcs, dbs, ddts, dus = [None] * c, [None] * c, [None] * c, [None] * c
    for t in range(c - 1, -1, -1):
        gy_t = _row1(gy, t)                        # (bt, d)
        dt_t = _row1(dt, t)[:, None, :]
        mag = jnp.exp(dt_t * ar_t[None])
        ang = dt_t * ai_t[None]
        car = mag * jnp.cos(ang)
        cai = mag * jnp.sin(ang)
        # y_t = 2·Σ_n C·hr  ⇒ the output cotangent enters the real channel
        dhr = dhr + 2.0 * _col(cmat, t) * gy_t[:, None, :]
        hr_prev = hrs[t - 1] if t > 0 else h0r
        hi_prev = his[t - 1] if t > 0 else h0i
        # hr_t = car·hr_p − cai·hi_p + bu ; hi_t = cai·hr_p + car·hi_p
        dcar = dhr * hr_prev + dhi * hi_prev
        dcai = -dhr * hi_prev + dhi * hr_prev
        # car = mag·cos(ang), cai = mag·sin(ang)
        dmag = dcar * jnp.cos(ang) + dcai * jnp.sin(ang)
        dang = -dcar * cai + dcai * car
        # mag = exp(dt·Ar) ⇒ ∂mag/∂Ar = mag·dt ; ang = dt·Ai ⇒ ∂ang/∂Ai = dt
        dmag_mag = dmag * mag
        dar_acc = dar_acc + jnp.sum(dmag_mag * dt_t, axis=0)
        dai_acc = dai_acc + jnp.sum(dang * dt_t, axis=0)
        dcs[t] = 2.0 * jnp.sum(gy_t[:, None, :] * hrs[t], axis=2)[:, :, None]
        dbs[t] = jnp.sum(dhr * _row1(dtu, t)[:, None, :], axis=2)[:, :, None]
        dh_b = jnp.sum(dhr * _col(bmat, t), axis=1)  # (bt, d)
        ddts[t] = (jnp.sum(dmag_mag * ar_t[None] + dang * ai_t[None], axis=1)
                   + dh_b * _row1(u, t))[:, None]
        dus[t] = (dh_b * _row1(dt, t))[:, None]
        # dh_{t-1} = conj(a)·dh_t in two channels
        dhr_new = car * dhr + cai * dhi
        dhi = -cai * dhr + car * dhi
        dhr = dhr_new
    dhr_carry[...] = dhr
    dhi_carry[...] = dhi

    @pl.when(li == nchunks - 1)
    def _():
        dh0r_ref[...] = dhr
        dh0i_ref[...] = dhi

    dar_ref[0] += dar_acc
    dai_ref[0] += dai_acc
    dc_ref[0] = jnp.swapaxes(
        jnp.concatenate(dcs, axis=2), 1, 2).astype(dc_ref.dtype)
    db_ref[0] = jnp.swapaxes(
        jnp.concatenate(dbs, axis=2), 1, 2).astype(db_ref.dtype)
    du = jnp.concatenate(dus, axis=1)              # (bt, c, d)
    if has_d:
        dval = d_ref[0].astype(jnp.float32)
        du = du + gy * dval[None]
        dd_ref[0] += jnp.sum(gy * u, axis=(0, 1), keepdims=False)[None]
    du_ref[...] = du.astype(du_ref.dtype)
    ddt = jnp.concatenate(ddts, axis=1)
    if softplus:
        ddt = ddt * jax.nn.sigmoid(dt_pre)
    ddt = ddt * mask  # padded steps contribute nothing to dbias
    ddelta_ref[...] = ddt.astype(ddelta_ref.dtype)
    dbias_ref[0] += jnp.sum(ddt, axis=(0, 1), keepdims=False)[None]


def _complex_fwd_impl(u, delta, Ar, Ai, B, C, D, z, delta_bias, h0r, h0i,
                      softplus, chunk, dtile, interpret, want_states=False):
    batch, seqlen, dim = u.shape
    dstate = Ar.shape[1]
    ngroups = B.shape[2]
    has_d, has_z = D is not None, z is not None
    chunk = min(chunk, _round_up(seqlen, 8))
    bt = _batch_tile(batch, chunk, LONG_BT_ELEMS // 2)  # two state carries

    up, deltap, Bp, Cp, zp, _, bp, lp, dp = _pad_args(
        u, delta, B, C, z, None, bt, chunk, dtile)
    nbt, nchunks, ndt = bp // bt, lp // chunk, dp // dtile
    Art, _, biasp = _pad_params(Ar, None, delta_bias, dim, dp)
    Ait, Dp, _ = _pad_params(Ai, D, None, dim, dp)
    if zp is None:
        zp = jnp.zeros((bp, 1, dp), u.dtype)
    h0rp = _pad_h0(h0r, bp, dim, dstate, dp, u.dtype)
    h0ip = _pad_h0(h0i, bp, dim, dstate, dp, u.dtype)

    ld_spec, ln_spec, z_spec, a_spec, vec_spec, states_spec = _specs(
        bt, chunk, dtile, dstate, nchunks, has_z, reverse=False,
        ngroups=ngroups, ndt=ndt,
    )
    last_spec = pl.BlockSpec((bt, dstate, dtile),
                             lambda bi, di, li: (bi, 0, di),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _cfwd_kernel, softplus=softplus, has_d=has_d, has_z=has_z,
        nchunks=nchunks, chunk=chunk, seqlen=seqlen,
        want_states=want_states,
    )
    states_shape = jax.ShapeDtypeStruct((bp, nchunks, dstate, dp),
                                        jnp.float32)
    out_specs = ([ld_spec]
                 + ([states_spec, states_spec] if want_states else [])
                 + [last_spec, last_spec])
    out_shape = ([jax.ShapeDtypeStruct((bp, lp, dp), u.dtype)]
                 + ([states_shape, states_shape] if want_states else [])
                 + [jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32),
                    jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32)])
    outs = pl.pallas_call(
        kernel,
        grid=(nbt, ndt, nchunks),
        in_specs=[ld_spec, ld_spec, a_spec, a_spec, ln_spec, ln_spec,
                  vec_spec, z_spec, vec_spec, last_spec, last_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, dstate, dtile), jnp.float32),
                        pltpu.VMEM((bt, dstate, dtile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(**_COMPILER_PARAMS),
        interpret=interpret,
    )(up, deltap, Art, Ait, Bp, Cp, Dp, zp, biasp, h0rp, h0ip)
    if want_states:
        out, statesr, statesi, lastr, lasti = outs
    else:
        out, lastr, lasti = outs
        statesr = statesi = None

    out = out[:batch, :seqlen, :dim]
    lastr = jnp.swapaxes(lastr, 1, 2)[:batch, :dim]  # (batch, dim, dstate)
    lasti = jnp.swapaxes(lasti, 1, 2)[:batch, :dim]
    return out, statesr, statesi, lastr, lasti


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _complex_core(u, delta, Ar, Ai, B, C, D, z, delta_bias, h0r, h0i,
                  softplus: bool, chunk: int, dtile: int, interpret: bool):
    # primal: skip the two checkpoint writes (the VJP fwd re-runs with
    # want_states=True, exactly like the real _scan_core)
    out, _, _, lastr, lasti = _complex_fwd_impl(
        u, delta, Ar, Ai, B, C, D, z, delta_bias, h0r, h0i,
        softplus, chunk, dtile, interpret, want_states=False)
    return out, lastr, lasti


def _complex_core_fwd(u, delta, Ar, Ai, B, C, D, z, delta_bias, h0r, h0i,
                      softplus, chunk, dtile, interpret):
    out, statesr, statesi, lastr, lasti = _complex_fwd_impl(
        u, delta, Ar, Ai, B, C, D, z, delta_bias, h0r, h0i,
        softplus, chunk, dtile, interpret, want_states=True)
    res = (u, delta, Ar, Ai, B, C, D, z, delta_bias, statesr, statesi)
    return (out, lastr, lasti), res


def _complex_core_bwd(softplus, chunk, dtile, interpret, res, cot):
    """Kernel-native complex adjoint: the _cbwd_kernel reverse chunk walk
    (two-channel mirror of _scan_core_bwd) with exact h0 AND last-state
    cotangents — no assoc detour, closing the N1/N2 parity row
    (selective_scan_bwd_kernel.cuh complex dispatch)."""
    u, delta, Ar, Ai, B, C, D, z, delta_bias, statesr, statesi = res
    g, glastr, glasti = cot

    batch, seqlen, dim = u.shape
    dstate = Ar.shape[1]
    has_d, has_z = D is not None, z is not None
    ngroups = B.shape[2]
    chunk = min(chunk, _round_up(seqlen, 8))
    # two carried cotangent channels + two recomputed state trajectories
    bt = _batch_tile(batch, chunk, LONG_BT_ELEMS_BWD // 2)

    up, deltap, Bp, Cp, zp, gp, bp, lp, dp = _pad_args(
        u, delta, B, C, z, g, bt, chunk, dtile)
    nbt, nchunks, ndt = bp // bt, lp // chunk, dp // dtile
    Art, _, biasp = _pad_params(Ar, None, delta_bias, dim, dp)
    Ait, Dp, _ = _pad_params(Ai, D, None, dim, dp)
    glastrp = _pad_h0(glastr, bp, dim, dstate, dp, u.dtype)
    glastip = _pad_h0(glasti, bp, dim, dstate, dp, u.dtype)
    if zp is None:
        zp = jnp.zeros((bp, 1, dp), u.dtype)

    def fit_bp(s):
        if s.shape[0] > bp:
            return s[:bp]
        if s.shape[0] < bp:
            return jnp.pad(s, ((0, bp - s.shape[0]),) +
                           ((0, 0),) * (s.ndim - 1))
        return s

    statesr, statesi = fit_bp(statesr), fit_bp(statesi)

    ld_spec, ln_spec, z_spec, a_spec, vec_spec, states_spec = _specs(
        bt, chunk, dtile, dstate, nchunks, has_z, reverse=True,
        ngroups=ngroups, ndt=ndt,
    )
    acc_nd = pl.BlockSpec((1, dstate, dtile), lambda bi, di, li: (bi, 0, di),
                          memory_space=pltpu.VMEM)
    acc_vec = pl.BlockSpec((1, 1, dtile), lambda bi, di, li: (bi, 0, di),
                           memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec(
        (1, bt, chunk, dstate),
        lambda bi, di, li: (di, bi, nchunks - 1 - li, 0),
        memory_space=pltpu.VMEM,
    )
    glast_spec = pl.BlockSpec((bt, dstate, dtile),
                              lambda bi, di, li: (bi, 0, di),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _cbwd_kernel, softplus=softplus, has_d=has_d, has_z=has_z,
        nchunks=nchunks, chunk=chunk, seqlen=seqlen,
    )
    (du, ddelta, dAr_bt, dAi_bt, dB, dC, dD_b, dz, dbias_b,
     dh0r, dh0i) = pl.pallas_call(
        kernel,
        grid=(nbt, ndt, nchunks),
        in_specs=[ld_spec, ld_spec, a_spec, a_spec, ln_spec, ln_spec,
                  vec_spec, z_spec, vec_spec, states_spec, states_spec,
                  ld_spec, glast_spec, glast_spec],
        out_specs=[ld_spec, ld_spec, acc_nd, acc_nd, bc_spec, bc_spec,
                   acc_vec, ld_spec, acc_vec, glast_spec, glast_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bp, lp, dp), u.dtype),           # du
            jax.ShapeDtypeStruct((bp, lp, dp), delta.dtype),       # ddelta
            jax.ShapeDtypeStruct((nbt, dstate, dp), jnp.float32),  # dAr parts
            jax.ShapeDtypeStruct((nbt, dstate, dp), jnp.float32),  # dAi parts
            jax.ShapeDtypeStruct((ndt, bp, lp, dstate), jnp.float32),  # dB
            jax.ShapeDtypeStruct((ndt, bp, lp, dstate), jnp.float32),  # dC
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dD parts
            jax.ShapeDtypeStruct((bp, lp, dp),
                                 z.dtype if has_z else jnp.float32),  # dz
            jax.ShapeDtypeStruct((nbt, 1, dp), jnp.float32),       # dbias
            jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32),   # dh0r
            jax.ShapeDtypeStruct((bp, dstate, dp), jnp.float32),   # dh0i
        ],
        scratch_shapes=[pltpu.VMEM((bt, dstate, dtile), jnp.float32),
                        pltpu.VMEM((bt, dstate, dtile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(**_COMPILER_PARAMS),
        interpret=interpret,
    )(up, deltap, Art, Ait, Bp, Cp, Dp, zp, biasp, statesr, statesi,
      gp, glastrp, glastip)

    du = du[:batch, :seqlen, :dim].astype(u.dtype)
    ddelta = ddelta[:batch, :seqlen, :dim].astype(delta.dtype)
    dAr = jnp.sum(dAr_bt, axis=0)[:, :dim].T.astype(Ar.dtype)
    dAi = jnp.sum(dAi_bt, axis=0)[:, :dim].T.astype(Ai.dtype)
    tiles_per_group = max(ndt // ngroups, 1)
    dB = dB.reshape(ngroups, tiles_per_group, bp, lp, dstate).sum(1)
    dC = dC.reshape(ngroups, tiles_per_group, bp, lp, dstate).sum(1)
    dB = dB.transpose(1, 2, 0, 3)[:batch, :seqlen].astype(B.dtype)
    dC = dC.transpose(1, 2, 0, 3)[:batch, :seqlen].astype(C.dtype)
    dD = jnp.sum(dD_b, axis=(0, 1))[:dim].astype(D.dtype) if has_d else None
    dz = dz[:batch, :seqlen, :dim].astype(z.dtype) if has_z else None
    dbias = (
        jnp.sum(dbias_b, axis=(0, 1))[:dim].astype(delta_bias.dtype)
        if delta_bias is not None else None
    )
    dh0r = jnp.swapaxes(dh0r, 1, 2)[:batch, :dim]
    dh0i = jnp.swapaxes(dh0i, 1, 2)[:batch, :dim]
    return (du, ddelta, dAr, dAi, dB, dC, dD, dz, dbias, dh0r, dh0i)


_complex_core.defvjp(_complex_core_fwd, _complex_core_bwd)


def _selective_scan_pallas_complex(u, delta, A, B, C, D, z, delta_bias,
                                   delta_softplus, return_last_state,
                                   chunk, dtile, interpret, initial_state):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if initial_state is not None:
        h0r = jnp.real(initial_state).astype(jnp.float32)
        h0i = jnp.imag(initial_state).astype(jnp.float32)
    else:  # concrete zeros: custom_vjp diff args cannot be None
        shape = (u.shape[0], u.shape[2], A.shape[1])
        h0r = h0i = jnp.zeros(shape, jnp.float32)
    out, lastr, lasti = _complex_core(
        u, delta, A.real.astype(jnp.float32), A.imag.astype(jnp.float32),
        B, C, D, z, delta_bias, h0r, h0i,
        delta_softplus, chunk, dtile, interpret)
    if return_last_state:
        # complex assembled OUTSIDE the custom_vjp so the last-state
        # cotangent flows into the kernel adjoint as two real channels
        # (the reference SelectiveScanFn drops this grad; the ring needs it)
        last = (lastr + 1j * lasti).astype(jnp.complex64)
        return out, last
    return out


# ---------------------------------------------------------------------------
# Small-batch (Hillis-Steele) long path
#
# The batch-tiled sequential kernels above need bt*n*dtile lanes of per-step
# work to fill the VPU; at batch <= HS_BATCH_MAX (TAL eval runs batch 1 at
# seqlen 2304; the 1M-token single-stream forward) there is not enough
# batch to tile, so these variants keep the round-1 design: one batch row
# per grid step, the in-chunk recurrence evaluated by a work-inefficient
# but fully parallel Hillis-Steele pass over the chunk axis (the
# cub::BlockScan analogue). Same checkpoints/carry contract as the
# sequential kernels; the dispatcher in _scan_fwd_impl picks per shape.

def _row(x, i: int):
    """x[i] for static i via lax.slice (Mosaic has no dynamic_slice)."""
    c = x.shape[0]
    i = i % c
    return jax.lax.squeeze(jax.lax.slice_in_dim(x, i, i + 1, axis=0), (0,))


def _combine(lhs, rhs):
    a1, b1 = lhs
    a2, b2 = rhs
    return a1 * a2, a2 * b1 + b2


def _take(x, sl, axis):
    return jax.lax.slice_in_dim(x, sl.start, sl.stop, axis=axis)


def _inclusive_scan(a, b, axis: int = 0):
    """Hillis–Steele inclusive scan of the pair (a, b) over `axis`.

    x_t = a_t · x_{t-1} + b_t; returns (a_cum, h) where a_cum_t = ∏_{s≤t} a_s
    and h_t is the recurrence value with x_{-1}=0. Uses only static
    concatenations and elementwise ops so it lowers cleanly through Mosaic
    (the generic `lax.associative_scan` emits zero-size slices Mosaic
    rejects). log2(c) passes over the chunk in VMEM.
    """
    c = a.shape[axis]
    shift = 1
    while shift < c:
        head_a = jnp.ones_like(_take(a, slice(0, shift), axis))
        head_b = jnp.zeros_like(head_a)
        a_prev = jnp.concatenate([head_a, _take(a, slice(0, c - shift), axis)],
                                 axis=axis)
        b_prev = jnp.concatenate([head_b, _take(b, slice(0, c - shift), axis)],
                                 axis=axis)
        b = a * b_prev + b
        a = a * a_prev
        shift *= 2
    return a, b


def _reverse_scan(a, s, axis: int = 0):
    """Hillis–Steele suffix scan: x_t = a_t · x_{t+1} + s_t (x_c = 0).

    Mirror of `_inclusive_scan` shifted the other way (Mosaic lowers neither
    `rev` nor odd-size associative_scan slices, so no flip-scan-flip).
    """
    c = a.shape[axis]
    shift = 1
    while shift < c:
        tail_a = jnp.ones_like(_take(a, slice(0, shift), axis))
        tail_s = jnp.zeros_like(tail_a)
        a_next = jnp.concatenate([_take(a, slice(shift, c), axis), tail_a],
                                 axis=axis)
        s_next = jnp.concatenate([_take(s, slice(shift, c), axis), tail_s],
                                 axis=axis)
        s = a * s_next + s
        a = a * a_next
        shift *= 2
    return s


def _discretize(u_ref, delta_ref, b_ref, a_t, bias_t, softplus: bool,
                li, chunk: int, seqlen: int):
    """Shared fwd/bwd prologue: load one chunk, discretize, mask padding.

    Timesteps at or beyond the true seqlen get dt = 0 (⇒ a = 1, bu = 0, an
    identity scan element), so seq padding never perturbs the carried state.
    Returns (u, dt_pre, dt, mask, a, bu): u/dt/mask (c, d) fp32,
    a/bu (c, n, d) fp32.
    """
    u = u_ref[0].astype(jnp.float32)             # (c, d)
    dt_pre = delta_ref[0].astype(jnp.float32) + bias_t  # (c, d)
    dt = jax.nn.softplus(dt_pre) if softplus else dt_pre
    pos = li * chunk + jax.lax.broadcasted_iota(jnp.int32, dt.shape, 0)
    mask = (pos < seqlen).astype(jnp.float32)    # (c, d)
    dt = dt * mask
    bmat = b_ref[0, 0].astype(jnp.float32)       # (c, n)
    a = jnp.exp(dt[:, None, :] * a_t[None])      # (c, n, d)
    bu = (dt * u)[:, None, :] * bmat[:, :, None]  # (c, n, d)
    return u, dt_pre, dt, mask, a, bu


def _fwd_kernel_hs(
    u_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, z_ref, bias_ref, h0_ref,
    out_ref, *rest,
    softplus: bool, has_d: bool, has_z: bool, nchunks: int,
    chunk: int, seqlen: int, want_states: bool = True,
):
    if want_states:
        states_ref, last_ref, h_carry = rest
    else:
        (last_ref, h_carry), states_ref = rest, None
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        # initial state: zeros normally; an incoming prefix when the caller
        # chains shards (sequence parallelism) or resumes a stream — the
        # smem_running_prefix seeding of the CUDA kernel (:251-254)
        h_carry[...] = h0_ref[0]

    a_t = a_ref[...].astype(jnp.float32)         # (n, d) — A tile, transposed
    bias_t = bias_ref[0].astype(jnp.float32)     # (1, d) broadcasts over c
    u, _, dt, _, a, bu = _discretize(
        u_ref, delta_ref, b_ref, a_t, bias_t, softplus, li, chunk, seqlen)

    h0 = h_carry[...]                            # (n, d) carried prefix state
    if want_states:
        states_ref[0, 0] = h0                    # checkpoint for the backward

    a_cum, h_in = _inclusive_scan(a, bu)
    h = h_in + a_cum * h0[None]                  # (c, n, d) full states

    c_mat = c_ref[0, 0].astype(jnp.float32)      # (c, n)
    y = jnp.sum(h * c_mat[:, :, None], axis=1)   # (c, d)
    if has_d:
        y = y + u * d_ref[0].astype(jnp.float32)
    if has_z:
        z = z_ref[0].astype(jnp.float32)
        y = y * (z * jax.nn.sigmoid(z))
    out_ref[0] = y.astype(out_ref.dtype)

    h_last = _row(h, -1)
    h_carry[...] = h_last

    @pl.when(li == nchunks - 1)
    def _():
        last_ref[0] = h_last


def _bwd_kernel_hs(
    u_ref, delta_ref, a_ref, b_ref, c_ref, d_ref, z_ref, bias_ref,
    states_ref, g_ref, glast_ref,
    du_ref, ddelta_ref, da_ref, db_ref, dc_ref, dd_ref, dz_ref, dbias_ref,
    dh0_ref,
    dh_carry,
    *, softplus: bool, has_d: bool, has_z: bool, nchunks: int,
    chunk: int, seqlen: int,
):
    li = pl.program_id(2)  # index maps reverse it: li=0 is the LAST chunk

    @pl.when(li == 0)
    def _():
        # adjoint seeded with the last-state cotangent (exact, unlike the
        # reference SelectiveScanFn which drops it)
        dh_carry[...] = glast_ref[0]
        da_ref[0] = jnp.zeros_like(da_ref[0])
        dd_ref[0] = jnp.zeros_like(dd_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    a_t = a_ref[...].astype(jnp.float32)
    bias_t = bias_ref[0].astype(jnp.float32)
    u, dt_pre, dt, mask, a, bu = _discretize(
        u_ref, delta_ref, b_ref, a_t, bias_t, softplus,
        nchunks - 1 - li, chunk, seqlen)

    # Recompute in-chunk forward states from the checkpointed chunk-initial
    # state (the CUDA bwd does the same from x_ptr, bwd_kernel.cuh:141-146).
    h0 = states_ref[0, 0]                        # (n, d)
    a_cum, h_in = _inclusive_scan(a, bu)
    h = h_in + a_cum * h0[None]                  # (c, n, d)
    h_prev = jnp.concatenate([h0[None], h[:-1]], axis=0)

    g = g_ref[0].astype(jnp.float32)             # (c, d) dL/dout
    c_mat = c_ref[0, 0].astype(jnp.float32)      # (c, n)

    if has_z:
        z = z_ref[0].astype(jnp.float32)
        sig = jax.nn.sigmoid(z)
        silu = z * sig
        y_pre = jnp.sum(h * c_mat[:, :, None], axis=1)
        if has_d:
            y_pre = y_pre + u * d_ref[0].astype(jnp.float32)
        dz = g * y_pre * (sig + silu * (1.0 - sig))
        dz_ref[0] = dz.astype(dz_ref.dtype)
        gy = g * silu                            # grad w.r.t. pre-gate y
    else:
        gy = g

    # dC[t,n] = Σ_d gy[t,d] · h[t,n,d]  (this tile's partial over d)
    dc_ref[0, 0] = jnp.sum(gy[:, None, :] * h, axis=2).astype(dc_ref.dtype)

    # Adjoint recurrence dh_t = C_t⊗gy_t + a_{t+1}⊙dh_{t+1}: a reverse
    # (suffix) scan with pair (a_{t+1}, s_t). The cross-chunk term a_first·dh
    # of chunk t+1 arrives via dh_carry and is absorbed into the last source.
    s = c_mat[:, :, None] * gy[:, None, :]       # (c, n, d)
    dh_next = dh_carry[...]                      # already includes a_first
    s = jnp.concatenate([s[:-1], (_row(s, -1) + dh_next)[None]], axis=0)
    a_shift = jnp.concatenate([a[1:], jnp.ones_like(a[:1])], axis=0)
    dh = _reverse_scan(a_shift, s)               # (c, n, d)
    dh_carry[...] = _row(a, 0) * _row(dh, 0)     # carry to previous chunk

    @pl.when(li == nchunks - 1)
    def _():
        # after chunk 0 the carry IS ∂L/∂h0 (the incoming-prefix cotangent)
        dh0_ref[0] = dh_carry[...]

    da_el = dh * h_prev                          # ∂L/∂a_t (c, n, d)
    da_ref[0] += jnp.sum(da_el * a * dt[:, None, :], axis=0)  # → dA (n, d)

    # dB[t,n] = Σ_d dh[t,n,d] · dt·u
    db_ref[0, 0] = jnp.sum(dh * (dt * u)[:, None, :], axis=2).astype(db_ref.dtype)

    bmat = b_ref[0, 0].astype(jnp.float32)       # (c, n)
    dh_b = jnp.sum(dh * bmat[:, :, None], axis=1)  # Σ_n dh·B (c, d)
    du = dh_b * dt
    if has_d:
        dval = d_ref[0].astype(jnp.float32)
        du = du + gy * dval
        dd_ref[0] += jnp.sum(gy * u, axis=0, keepdims=True)
    du_ref[0] = du.astype(du_ref.dtype)

    ddt = jnp.sum(da_el * a * a_t[None], axis=1) + dh_b * u
    if softplus:
        ddt = ddt * jax.nn.sigmoid(dt_pre)
    ddt = ddt * mask  # padded steps contribute nothing to dbias
    ddelta_ref[0] = ddt.astype(ddelta_ref.dtype)
    dbias_ref[0] += jnp.sum(ddt, axis=0, keepdims=True)
