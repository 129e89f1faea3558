"""VMEM-resident multi-head attention for short token rows (vision shapes).

The suite's spatial attention runs at N = 1 + 14·14 = 197 tokens per frame
(reference: egocentric-understanding/avion/models/timemamba.py:148-170 and
vision_transformer.py attention blocks). At that length the whole score row
fits in VMEM, so the classic flash-attention online-softmax machinery (block
scanning, running max/denominator rescale) is pure overhead — the generic
Pallas flash kernel measures SLOWER than XLA's einsum path here (BASELINE.md
round-3 notes). This kernel instead computes, per (instance, head):

    scores = q @ k^T · sm_scale      (MXU, fp32 accumulate, stays in VMEM)
    w      = softmax(scores)         (VPU, fp32 — tighter than the bf16
                                      scores tensor of the XLA path)
    out    = w @ v                   (MXU)

with NO HBM round-trip for the (N, N) scores — the XLA path writes + reads
the (I, H, N, N) tensor (≈ 600 MB/layer at TimeMamba-B scale), which is the
single largest non-matmul time sink in the forward profile.

Backward falls back to the standard einsum-form gradients (recomputing the
scores), mirroring what XLA's autodiff of the einsum path does — training
keeps identical asymptotics while the forward gets the fused path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Whole-row kernel is only sensible while the (N, N) fp32 score tile and the
# (bt·ht) head tiles fit comfortably in VMEM.
MAX_ROW_TOKENS = 512


def _pick_tiles(I: int, H: int, N: int, dh: int) -> tuple[int, int]:
    """Instance/head tile sizes under a ~6 MB working-set target."""
    # bytes per (instance, head): q,k,v,out blocks (bf16) + fp32 scores
    per_ih = 4 * N * dh * 2
    budget = 6 * 1024 * 1024 - 4 * N * N
    ih = max(budget // max(per_ih, 1), 1)
    ht = H if ih >= H else max(1, ih)
    bt = max(min(ih // ht, I), 1)
    while I % bt:
        bt -= 1
    while H % ht:
        ht -= 1
    return bt, ht


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, bt: int, ht: int,
                sm_scale: float, batched: bool):
    if batched:
        # one batched dot over all (instance, head) pairs in the block —
        # avoids draining the MXU pipeline between 2·bt·ht small matmuls
        N, dh = q_ref.shape[2], q_ref.shape[3]
        qm = q_ref[...].reshape(bt * ht, N, dh) * sm_scale
        km = k_ref[...].reshape(bt * ht, N, dh)
        vm = v_ref[...].reshape(bt * ht, N, dh)
        s = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                         # (bh, N, N) fp32, VMEM
        s = s - jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s)
        w = (e / jnp.sum(e, axis=2, keepdims=True)).astype(vm.dtype)
        o = jax.lax.dot_general(
            w, vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)
        return
    for i in range(bt):
        for h in range(ht):
            qm = q_ref[i, h] * sm_scale           # (N, dh)
            km = k_ref[i, h]
            vm = v_ref[i, h]
            s = jax.lax.dot_general(
                qm, km, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                     # (N, N) fp32, VMEM only
            s = s - jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s)
            w = e / jnp.sum(e, axis=1, keepdims=True)
            o = jnp.dot(w.astype(vm.dtype), vm,
                        preferred_element_type=jnp.float32)
            o_ref[i, h] = o.astype(o_ref.dtype)


def _mha_fwd_impl(q, k, v, sm_scale: float, interpret: bool,
                  tiles: tuple[int, int] | None = None,
                  batched: bool = True):
    I, H, N, dh = q.shape
    bt, ht = tiles if tiles is not None else _pick_tiles(I, H, N, dh)
    spec = pl.BlockSpec((bt, ht, N, dh), lambda i, h: (i, h, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_mha_kernel, bt=bt, ht=ht, sm_scale=sm_scale,
                             batched=batched)
    return pl.pallas_call(
        kern,
        grid=(I // bt, H // ht),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha(q, k, v, sm_scale: float, interpret: bool):
    return _mha_fwd_impl(q, k, v, sm_scale, interpret)


def _mha_fwd(q, k, v, sm_scale, interpret):
    return _mha_fwd_impl(q, k, v, sm_scale, interpret), (q, k, v)


def _mha_bwd(sm_scale, interpret, res, g):
    # einsum-form gradients with score recompute (same shapes XLA's autodiff
    # of the reference einsum path materializes); softmax in fp32.
    q, k, v = res
    s = jnp.einsum("ihqd,ihkd->ihqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    w = jax.nn.softmax(s, axis=-1)
    wg = w.astype(g.dtype)
    dv = jnp.einsum("ihqk,ihqd->ihkd", wg, g)
    dp = jnp.einsum("ihqd,ihkd->ihqk", g, v,
                    preferred_element_type=jnp.float32)
    ds = w * (dp - jnp.sum(dp * w, axis=-1, keepdims=True))
    ds = (ds * sm_scale).astype(q.dtype)
    dq = jnp.einsum("ihqk,ihkd->ihqd", ds, k)
    dk = jnp.einsum("ihqk,ihqd->ihkd", ds, q)
    return dq, dk, dv


_mha.defvjp(_mha_fwd, _mha_bwd)


def vision_mha(q: jax.Array, k: jax.Array, v: jax.Array,
               sm_scale: float | None = None,
               interpret: bool = False) -> jax.Array:
    """Fused short-row MHA. q/k/v (I, H, N, dh) → (I, H, N, dh).

    Requires N ≤ MAX_ROW_TOKENS (whole-row softmax in VMEM). sm_scale
    defaults to 1/sqrt(dh).
    """
    I, H, N, dh = q.shape
    if N > MAX_ROW_TOKENS:
        raise ValueError(f"vision_mha: N={N} exceeds whole-row limit "
                         f"{MAX_ROW_TOKENS}; use the flash kernel instead")
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(dh)
    return _mha(q, k, v, float(sm_scale), interpret)


# ---------------------------------------------------------------------------
# Head-major packed-qkv whole-row kernel (benchmarks/r8_attn.py winner).
#
# The flattened-layout kernel above still LOSES to XLA's einsum fusion at the
# TimeMamba shape (1.37 vs 1.23 ms/layer) because both pay layout taxes: the
# (B, 1+n, t, D) producer must be transposed/flattened into per-head slabs.
# This variant removes every tax at once: the qkv projection itself emits a
# HEAD-MAJOR (B, T, 3H, N, dh) tensor (the layout change rides the projection
# dot — XLA dot layout assignment), the kernel reads that ONE array through
# three BlockSpecs (q/k/v block-index offsets into the 3H dim — no jnp.split
# HBM round-trip), and per (b, t) all H heads' fp32 score rows live and die
# in VMEM. Chip A/B at (B8, T16, H12, N197, dh64) over the 12-layer sandwich:
# einsum 2.055 → kernel 1.825 ms/layer (1.13x).


def _row_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                    sm_scale: float):
    for h in range(heads):
        q = q_ref[h]                                   # (N, dh)
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                   # (N, N) fp32, VMEM
        s = s - jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s)
        w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v_ref.dtype)
        o_ref[h] = jnp.dot(w, v_ref[h],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _row_mha_fwd_impl(qkv5, sm_scale: float, interpret: bool):
    b, t, h3, n, dh = qkv5.shape
    h = h3 // 3
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, None, h, n, dh),
        lambda bi, ti, o=off: (bi, ti, o, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_row_mha_kernel, heads=h, sm_scale=sm_scale),
        grid=(b, t),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((None, None, h, n, dh),
                               lambda bi, ti: (bi, ti, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, n, dh), qkv5.dtype),
        interpret=interpret,
    )(qkv5, qkv5, qkv5)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _row_mha(qkv5, sm_scale: float, interpret: bool):
    return _row_mha_fwd_impl(qkv5, sm_scale, interpret)


def _row_mha_fwd(qkv5, sm_scale, interpret):
    return _row_mha_fwd_impl(qkv5, sm_scale, interpret), (qkv5,)


def _row_mha_bwd(sm_scale, interpret, res, g):
    # einsum-form gradients with fp32-softmax score recompute, batched over
    # (b, t); the cotangent repacks into the head-major 3H layout so the
    # projection-dot layout assignment applies to the bwd matmuls too
    (qkv5,) = res
    h = qkv5.shape[2] // 3
    q, k, v = qkv5[:, :, :h], qkv5[:, :, h:2 * h], qkv5[:, :, 2 * h:]
    s = jnp.einsum("bthqd,bthkd->bthqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    w = jax.nn.softmax(s, axis=-1)
    wg = w.astype(g.dtype)
    dv = jnp.einsum("bthqk,bthqd->bthkd", wg, g)
    dp = jnp.einsum("bthqd,bthkd->bthqk", g, v,
                    preferred_element_type=jnp.float32)
    ds = w * (dp - jnp.sum(dp * w, axis=-1, keepdims=True))
    ds = (ds * sm_scale).astype(q.dtype)
    dq = jnp.einsum("bthqk,bthkd->bthqd", ds, k)
    dk = jnp.einsum("bthqk,bthqd->bthkd", ds, q)
    return (jnp.concatenate([dq, dk, dv], axis=2),)


_row_mha.defvjp(_row_mha_fwd, _row_mha_bwd)


def row_mha_qkv(qkv5: jax.Array, sm_scale: float | None = None,
                interpret: bool = False) -> jax.Array:
    """Head-major packed-qkv whole-row MHA.

    qkv5 (B, T, 3H, N, dh) with q heads at [:H], k at [H:2H], v at [2H:]
    (i.e. the fused (D, 3D) qkv kernel reshaped to (D, 3H, dh)) →
    (B, T, H, N, dh). Requires N ≤ MAX_ROW_TOKENS.
    """
    b, t, h3, n, dh = qkv5.shape
    if h3 % 3:
        raise ValueError(f"row_mha_qkv: 3H dim {h3} not divisible by 3")
    if n > MAX_ROW_TOKENS:
        raise ValueError(f"row_mha_qkv: N={n} exceeds whole-row limit "
                         f"{MAX_ROW_TOKENS}")
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(dh)
    return _row_mha(qkv5, float(sm_scale), interpret)
