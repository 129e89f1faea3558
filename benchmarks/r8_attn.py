"""r8: bespoke whole-row spatial-attention kernel vs the production einsum.

VERDICT r3 next-#1: the spatial attention core is the largest non-floor
bucket (1.45 ms/layer standalone vs ~0.8 ms unfused-HBM floor). Two prior
kernels lost to XLA's einsum fusion (r4_attn whole-row at the flattened
(I,H,N,dh) layout: 1.37 vs 1.23 ms; r3_exp11 flash: +8-13%) — both paid
layout taxes XLA's path avoids. This experiment removes every tax at once:

  * the qkv projection writes a HEAD-MAJOR (B, T, 3H, N, dh) tensor — the
    layout change rides the projection dot itself (XLA dot layout
    assignment, the r5_attn_layout trick), so each (N, dh) head slab is one
    contiguous 25 KB DMA;
  * the kernel consumes the SAME array through three BlockSpecs (q/k/v
    block-index offsets into the 3H dim) — the jnp.split that costs ~0.3
    ms/layer of HBM round-trips in the einsum path disappears;
  * per (b, t, head-block): scores = q @ k^T in fp32 stay in VMEM through
    softmax and the w @ v matmul — the (I, H, N, N) score tensor (119 MB
    write + 119 MB read per layer, bf16) never exists in HBM;
  * the out-projection consumes the kernel's (B, T, H, N, dh) output with
    the contraction over (h, dh), riding the layout back to patch-major
    (B, N, T, D) for the residual add.

Variants: hh = heads per grid step (1 = smallest working set, 12 = one
step per (b, t) with 300 KB DMAs); KT = dh-major (dh, N) streams (half the
VMEM lane padding, sublane-contracted matmuls).

Run on the chip: python benchmarks/r8_attn.py [--iters 100]
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

B, N, T, D, H = 8, 196, 16, 768, 12
DH = D // H
NP = N + 1          # 197 tokens with the broadcast cls
LAYERS = 12
BF = jnp.bfloat16


def _fetch(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def time_alt(f, a0, a1, iters=100):
    _fetch(f(*a0)); _fetch(f(*a1))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*(a0 if i % 2 == 0 else a1))
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def make_params(key):
    ks = jax.random.split(key, 6)
    s = 0.02
    return dict(
        ln_w=jnp.ones((D,), jnp.float32), ln_b=jnp.zeros((D,), jnp.float32),
        qkv_w=s * jax.random.normal(ks[0], (D, 3 * D), jnp.float32),
        qkv_b=jnp.zeros((3 * D,), jnp.float32),
        out_w=s * jax.random.normal(ks[1], (D, D), jnp.float32),
        out_b=jnp.zeros((D,), jnp.float32),
    )


def ln(x, w, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * w + b).astype(x.dtype)


# --------------------------------------------------------------------------
# A: the production path (FusedMHA seq_axis=1 patch-major einsums)


def sandwich_einsum(p, cls, tr):
    cls4 = jnp.broadcast_to(cls.astype(tr.dtype)[:, :, None], (B, 1, T, D))
    xs = jnp.concatenate([cls4, tr], axis=1)          # (B, 1+n, t, D)
    xs = ln(xs, p["ln_w"], p["ln_b"])
    qkv = (xs @ p["qkv_w"].astype(xs.dtype)) + p["qkv_b"].astype(xs.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, NP, T, H, DH)
    k = k.reshape(B, NP, T, H, DH)
    v = v.reshape(B, NP, T, H, DH)
    scores = jnp.einsum("bqthd,bkthd->bthqk", q, k) * (1.0 / math.sqrt(DH))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bthqk,bkthd->bqthd", w, v).reshape(B, NP, T, D)
    out = (out @ p["out_w"].astype(out.dtype)) + p["out_b"].astype(out.dtype)
    cls_out = out[:, 0].mean(axis=1)[:, None]          # (B, 1, D)
    return cls_out, out[:, 1:]


# --------------------------------------------------------------------------
# K: whole-row kernel, token-major (N, dh) head slabs


def _row_kernel(q_ref, k_ref, v_ref, o_ref, *, hh: int, scale: float):
    for h in range(hh):
        q = q_ref[h]                                   # (N, dh)
        s = jax.lax.dot_general(
            q, k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                      # (N, N) fp32, VMEM
        s = s - jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s)
        w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v_ref.dtype)
        o = jnp.dot(w, v_ref[h], preferred_element_type=jnp.float32)
        o_ref[h] = o.astype(o_ref.dtype)


def row_attention(qkv5, hh: int, interpret: bool = False):
    """qkv5 (B, T, 3H, N, dh) head-major → (B, T, H, N, dh)."""
    b, t, h3, n, dh = qkv5.shape
    h = h3 // 3
    hb = h // hh
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, None, hh, n, dh),
        lambda bi, ti, hi, o=off: (bi, ti, o * hb + hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_row_kernel, hh=hh, scale=1.0 / math.sqrt(dh)),
        grid=(b, t, hb),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((None, None, hh, n, dh),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, n, dh), qkv5.dtype),
        interpret=interpret,
    )(qkv5, qkv5, qkv5)


def sandwich_kernel(p, cls, tr, hh: int, interpret: bool = False):
    cls4 = jnp.broadcast_to(cls.astype(tr.dtype)[:, :, None], (B, 1, T, D))
    xs = jnp.concatenate([cls4, tr], axis=1)          # (B, 1+n, t, D)
    xs = ln(xs, p["ln_w"], p["ln_b"])
    w3 = p["qkv_w"].reshape(D, 3 * H, DH).astype(xs.dtype)
    b3 = p["qkv_b"].reshape(3 * H, DH).astype(xs.dtype)
    # head-major projection: layout change rides the dot
    qkv5 = jnp.einsum("bntd,dhe->bthne", xs, w3) + b3[None, None, :, None]
    out5 = row_attention(qkv5, hh=hh, interpret=interpret)
    wo = p["out_w"].reshape(H, DH, D).astype(out5.dtype)
    out = (jnp.einsum("bthne,hef->bntf", out5, wo)
           + p["out_b"].astype(out5.dtype))
    cls_out = out[:, 0].mean(axis=1)[:, None]
    return cls_out, out[:, 1:]


# --------------------------------------------------------------------------
# KT: dh-major (dh, N) streams — half the lane padding (dh=64 pads to 128
# lanes in K; here N=197 pads to 256), sublane-contracted matmuls.


def _row_kernel_t(q_ref, k_ref, v_ref, o_ref, *, hh: int, scale: float):
    for h in range(hh):
        q = q_ref[h]                                   # (dh, N)
        s = jax.lax.dot_general(
            q, k_ref[h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                      # (N, N)
        s = s - jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s)
        w = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v_ref.dtype)
        o = jax.lax.dot_general(                       # (dh, N): w^T·v^T
            v_ref[h], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[h] = o.astype(o_ref.dtype)


def row_attention_t(qkv5, hh: int, interpret: bool = False):
    """qkv5 (B, T, 3H, dh, N) dh-major → (B, T, H, dh, N)."""
    b, t, h3, dh, n = qkv5.shape
    h = h3 // 3
    hb = h // hh
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        (None, None, hh, dh, n),
        lambda bi, ti, hi, o=off: (bi, ti, o * hb + hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_row_kernel_t, hh=hh, scale=1.0 / math.sqrt(dh)),
        grid=(b, t, hb),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((None, None, hh, dh, n),
                               lambda bi, ti, hi: (bi, ti, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, dh, n), qkv5.dtype),
        interpret=interpret,
    )(qkv5, qkv5, qkv5)


def sandwich_kernel_t(p, cls, tr, hh: int, interpret: bool = False):
    cls4 = jnp.broadcast_to(cls.astype(tr.dtype)[:, :, None], (B, 1, T, D))
    xs = jnp.concatenate([cls4, tr], axis=1)
    xs = ln(xs, p["ln_w"], p["ln_b"])
    w3 = p["qkv_w"].reshape(D, 3 * H, DH).astype(xs.dtype)
    b3 = p["qkv_b"].reshape(3 * H, DH).astype(xs.dtype)
    qkv5 = (jnp.einsum("bntd,dhe->bthen", xs, w3)
            + b3[None, None, :, :, None])              # (B, T, 3H, dh, N)
    out5 = row_attention_t(qkv5, hh=hh, interpret=interpret)
    wo = p["out_w"].reshape(H, DH, D).astype(out5.dtype)
    out = (jnp.einsum("bthen,hef->bntf", out5, wo)
           + p["out_b"].astype(out5.dtype))
    cls_out = out[:, 0].mean(axis=1)[:, None]
    return cls_out, out[:, 1:]


def stack(fn, p, cls, tr):
    for _ in range(LAYERS):
        c, o = fn(p, cls, tr)
        cls = cls + c.astype(cls.dtype)
        tr = tr + o
    return cls, tr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    interp = jax.default_backend() != "tpu"

    p = make_params(jax.random.PRNGKey(0))
    args0 = (jax.random.normal(jax.random.PRNGKey(1), (B, 1, D), BF),
             jax.random.normal(jax.random.PRNGKey(2), (B, N, T, D), BF))
    args1 = (jax.random.normal(jax.random.PRNGKey(3), (B, 1, D), BF),
             jax.random.normal(jax.random.PRNGKey(4), (B, N, T, D), BF))

    fa = jax.jit(lambda c, t: stack(sandwich_einsum, p, c, t))
    ca, ta = fa(*args0)
    t_a = time_alt(fa, args0, args1, args.iters)
    print(f"A einsum (production): {t_a*1e3:.2f} ms / {LAYERS} layers "
          f"({t_a/LAYERS*1e3:.3f} ms/layer)", flush=True)

    variants = [("K", sandwich_kernel, 1), ("K", sandwich_kernel, 4),
                ("K", sandwich_kernel, 12), ("KT", sandwich_kernel_t, 12),
                ("KT", sandwich_kernel_t, 4)]
    for name, fn, hh in variants:
        try:
            f = jax.jit(lambda c, t, fn=fn, hh=hh: stack(
                lambda p_, c_, t_: fn(p_, c_, t_, hh, interp), p, c, t))
            cb, tb = f(*args0)
            err = max(
                float(jnp.max(jnp.abs(ca.astype(jnp.float32)
                                      - cb.astype(jnp.float32)))),
                float(jnp.max(jnp.abs(ta.astype(jnp.float32)
                                      - tb.astype(jnp.float32)))))
            t_k = time_alt(f, args0, args1, args.iters)
            print(f"{name} hh={hh}: {t_k*1e3:.2f} ms "
                  f"({t_k/LAYERS*1e3:.3f} ms/layer)  A/{name} = "
                  f"{t_a/t_k:.3f}x  err={err:.2e}", flush=True)
        except Exception as e:
            print(f"{name} hh={hh}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
