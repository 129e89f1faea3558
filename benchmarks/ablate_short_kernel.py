"""Ablate the fused-bidir short kernel's cost components on the chip.

Local modified copies of the kernel body with parts removed:
  full        — production kernel (baseline)
  no_exp      — exp(x) → (1+x)  (isolates transcendental cost)
  no_yred     — per-step y reduction removed (sum h once at end)
  no_gate     — D-skip + silu(z) epilogue removed
  one_dir     — forward direction only (scaling check)
  vec_y       — h states kept per step, y computed vectorized after loop

Usage: python benchmarks/ablate_short_kernel.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_mamba_suite_tpu.ops.selective_scan_pallas import (
    _col,
    _pad_params,
    _round_up,
    _row1,
    _short_pad,
    _short_prep,
)


def _fetch(out):
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def _bidir_kernel(
    uf_ref, dtf_ref, af_ref, bf_ref, cf_ref, df_ref, zf_ref, biasf_ref,
    ub_ref, dtb_ref, ab_ref, bb_ref, cb_ref, db_ref, zb_ref, biasb_ref,
    outf_ref, outb_ref,
    *, seqlen: int, variant: str,
):
    af_t = af_ref[...].astype(jnp.float32)
    ab_t = ab_ref[...].astype(jnp.float32)
    uf, _, dtf, _, bfm, cfm = _short_prep(
        uf_ref, dtf_ref, bf_ref, cf_ref,
        biasf_ref[0].astype(jnp.float32), True, seqlen)
    ub, _, dtb, _, bbm, cbm = _short_prep(
        ub_ref, dtb_ref, bb_ref, cb_ref,
        biasb_ref[0].astype(jnp.float32), True, seqlen)
    bt, c, d = uf.shape
    n = af_t.shape[0]
    dtuf = dtf * uf
    dtub = dtb * ub

    myexp = (lambda x: 1.0 + x) if variant == "no_exp" else jnp.exp

    if variant == "prep_only":
        outf_ref[...] = (uf + dtf).astype(outf_ref.dtype)
        outb_ref[...] = (ub + dtb + bfm[:, :1, :1] + cfm[:, :1, :1]
                         + bbm[:, :1, :1] + cbm[:, :1, :1]
                         + af_t[None, :, :] + ab_t[None, :, :]).astype(outb_ref.dtype)
        return
    hf = jnp.zeros((bt, n, d), jnp.float32)
    hb = jnp.zeros((bt, n, d), jnp.float32)
    ysf = [None] * c
    ysb = [None] * c
    hsf = [None] * c
    hsb = [None] * c
    for i in range(c):
        tf, tb = i, c - 1 - i
        a_f = myexp(_row1(dtf, tf)[:, None, :] * af_t[None])
        bu_f = _row1(dtuf, tf)[:, None, :] * _col(bfm, tf)
        hf = a_f * hf + bu_f
        if variant != "one_dir":
            a_b = myexp(_row1(dtb, tb)[:, None, :] * ab_t[None])
            bu_b = _row1(dtub, tb)[:, None, :] * _col(bbm, tb)
            hb = a_b * hb + bu_b
        if variant == "no_yred":
            continue
        if variant == "vec_y":
            hsf[tf] = hf[:, None]
            hsb[tb] = hb[:, None]
            continue
        ysf[tf] = jnp.sum(hf * _col(cfm, tf), axis=1)[:, None]
        if variant != "one_dir":
            ysb[tb] = jnp.sum(hb * _col(cbm, tb), axis=1)[:, None]

    if variant == "no_yred":
        outf_ref[...] = jnp.broadcast_to(
            jnp.sum(hf, axis=1)[:, None], (bt, c, d)).astype(outf_ref.dtype)
        outb_ref[...] = jnp.broadcast_to(
            jnp.sum(hb, axis=1)[:, None], (bt, c, d)).astype(outb_ref.dtype)
        return
    if variant == "vec_y":
        hF = jnp.concatenate(hsf, axis=1)        # (bt, c, n, d)
        hB = jnp.concatenate(hsb, axis=1)
        cF = jnp.swapaxes(cfm, 1, 2)[:, :, :, None]   # (bt, c, n, 1)
        cB = jnp.swapaxes(cbm, 1, 2)[:, :, :, None]
        yf = jnp.sum(hF * cF, axis=2)
        yb = jnp.sum(hB * cB, axis=2)
    else:
        yf = jnp.concatenate(ysf, axis=1)
        yb = (jnp.concatenate(ysb, axis=1)
              if variant != "one_dir" else jnp.zeros_like(yf))

    if variant != "no_gate":
        yf = yf + uf * df_ref[0].astype(jnp.float32)[None]
        zf = zf_ref[...].astype(jnp.float32)
        yf = yf * (zf * jax.nn.sigmoid(zf))
        if variant != "one_dir":
            yb = yb + ub * db_ref[0].astype(jnp.float32)[None]
            zb = zb_ref[...].astype(jnp.float32)
            yb = yb * (zb * jax.nn.sigmoid(zb))
    outf_ref[...] = yf.astype(outf_ref.dtype)
    outb_ref[...] = yb.astype(outb_ref.dtype)


def run_variant(variant, u, dt, A, B, C, D, z, bias, bt=32, dtile=256):
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    c = _round_up(seqlen, 8)

    def prep(u, dtv, Av, Bv, Cv, Dv, zv, biasv):
        up, dtp, Bp, Cp, zp, _, bp, dp = _short_pad(
            u, dtv, Bv[:, :, None], Cv[:, :, None], zv, None, bt, c, dtile)
        At, Dp, biasp = _pad_params(Av, Dv, biasv, dim, dp)
        return up, dtp, At, Bp, Cp, Dp, zp, biasp, bp, dp

    upf, dtpf, Atf, Bpf, Cpf, Dpf, zpf, biaspf, bp, dp = prep(
        u, dt, A, B, C, D, z, bias)
    nbt, ndt = bp // bt, dp // dtile

    ld = pl.BlockSpec((bt, c, dtile), lambda bi, di: (bi, 0, di),
                      memory_space=pltpu.VMEM)
    ln = pl.BlockSpec((1, bt, c, dstate), lambda bi, di: (0, bi, 0, 0),
                      memory_space=pltpu.VMEM)
    a_s = pl.BlockSpec((dstate, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    v_s = pl.BlockSpec((1, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    kern = functools.partial(_bidir_kernel, seqlen=seqlen, variant=variant)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(nbt, ndt),
        in_specs=[ld, ld, a_s, ln, ln, v_s, ld, v_s] * 2,
        out_specs=[ld, ld],
        out_shape=[jax.ShapeDtypeStruct((bp, c, dp), u.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*a))
    args = (upf, dtpf, Atf, Bpf, Cpf, Dpf, zpf, biaspf) * 2
    t = _time(f, *args)
    print(f"{variant:10s} bt={bt} dtile={dtile}: {t*1e3:7.3f} ms  "
          f"{2*batch*seqlen/t/1e6:6.1f} Mtok/s", flush=True)
    return t


def main():
    b, l, d, n = 1568, 16, 768, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    u = jax.random.normal(ks[0], (b, l, d), jnp.bfloat16)
    dt = 0.5 * jax.random.uniform(ks[1], (b, l, d), jnp.bfloat16)
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n), jnp.bfloat16)
    C = jax.random.normal(ks[4], (b, l, n), jnp.bfloat16)
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (b, l, d), jnp.bfloat16)
    bias = 0.5 * jax.random.uniform(ks[7], (d,))
    import itertools
    cases = [("prep_only", 32, 256), ("full", 32, 128), ("full", 32, 384),
             ("full", 64, 128), ("full", 8, 256), ("prep_only", 32, 384)]
    for v, bt, dtile in cases:
        try:
            run_variant(v, u, dt, A, B, C, D, z, bias, bt=bt, dtile=dtile)
        except Exception as e:
            print(f"{v:10s} bt={bt} dtile={dtile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
