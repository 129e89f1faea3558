"""Round-3 kernel lab: short-path scan variants at the adapter shape.

The production fused-bidir kernel runs ~21% of its HBM roofline — VPU-bound
on the per-step exp/slice/broadcast/reduce chain. Variants probe where the
time goes (single-direction kernels; production impact would be 2x):

  base      — production-style sequential walk (exp per step, reduce per step)
  pre_a     — decay a = exp(dt⊗A) precomputed VECTORIZED for all steps,
              loop slices it (is per-step exp emission the cost?)
  pre_a_gy  — pre_a + per-step states stored, C-reduction done once after
              the loop as one big vectorized multiply-reduce
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_mamba_suite_tpu.ops.selective_scan_pallas import (
    _col,
    _row1,
    _short_prep,
)


def _kernel(u_ref, dt_ref, a_ref, b_ref, c_ref, bias_ref, out_ref,
            *, seqlen: int, mode: str):
    a_t = a_ref[...].astype(jnp.float32)               # (n, d)
    bias_t = bias_ref[0].astype(jnp.float32)
    u, _, dt, _, bmat, cmat = _short_prep(
        u_ref, dt_ref, b_ref, c_ref, bias_t, True, seqlen)
    bt, c, d = u.shape
    n = a_t.shape[0]
    dtu = dt * u

    h = jnp.zeros((bt, n, d), jnp.float32)
    if mode in ("base", "no_exp", "exp_bf16"):
        ys = [None] * c
        for t in range(c):
            pre = _row1(dt, t)[:, None, :] * a_t[None]
            if mode == "no_exp":      # WRONG MATH — measures exp's share
                a_step = pre + 1.0
            elif mode == "exp_bf16":  # WRONG-ish — bf16 EUP rate probe
                a_step = jnp.exp(pre.astype(jnp.bfloat16)).astype(jnp.float32)
            else:
                a_step = jnp.exp(pre)
            h = a_step * h + _row1(dtu, t)[:, None, :] * _col(bmat, t)
            ys[t] = jnp.sum(h * _col(cmat, t), axis=1)[:, None]
        y = jnp.concatenate(ys, axis=1)
    else:
        # vectorized decay for ALL steps: (bt, c, n, d)
        a_all = jnp.exp(dt[:, :, None, :] * a_t[None, None])
        if mode == "pre_a":
            ys = [None] * c
            for t in range(c):
                a_step = jax.lax.squeeze(
                    jax.lax.slice_in_dim(a_all, t, t + 1, axis=1), (1,))
                h = a_step * h + _row1(dtu, t)[:, None, :] * _col(bmat, t)
                ys[t] = jnp.sum(h * _col(cmat, t), axis=1)[:, None]
            y = jnp.concatenate(ys, axis=1)
        else:  # pre_a_gy: store states, reduce once
            hs = [None] * c
            for t in range(c):
                a_step = jax.lax.squeeze(
                    jax.lax.slice_in_dim(a_all, t, t + 1, axis=1), (1,))
                h = a_step * h + _row1(dtu, t)[:, None, :] * _col(bmat, t)
                hs[t] = h[:, None]
            h_all = jnp.concatenate(hs, axis=1)        # (bt, c, n, d)
            # y[b,c,d] = Σ_n h_all · C[b,n,c] — one vectorized reduce
            y = jnp.sum(h_all * jnp.swapaxes(cmat, 1, 2)[..., None], axis=2)
    out_ref[...] = y.astype(out_ref.dtype)


def run_variant(mode: str, bt: int, u, dt, A, B, C, bias, dtile=256):
    b, l, d = u.shape
    n = A.shape[1]
    c = 16
    from video_mamba_suite_tpu.ops.selective_scan_pallas import (
        _pad_params,
        _short_pad,
    )

    up, dtp, Bp, Cp, _, _, bp, dp = _short_pad(
        u, dt, B[:, :, None], C[:, :, None], None, None, bt, c, dtile)
    At, _, biasp = _pad_params(A, None, bias, d, dp)
    nbt, ndt = bp // bt, dp // dtile
    ld = pl.BlockSpec((bt, c, dtile), lambda bi, di: (bi, 0, di),
                      memory_space=pltpu.VMEM)
    ln = pl.BlockSpec((1, bt, c, n), lambda bi, di: (0, bi, 0, 0),
                      memory_space=pltpu.VMEM)
    a_s = pl.BlockSpec((n, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    v_s = pl.BlockSpec((1, dtile), lambda bi, di: (0, di),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, seqlen=l, mode=mode),
        grid=(nbt, ndt),
        in_specs=[ld, ld, a_s, ln, ln, v_s],
        out_specs=ld,
        out_shape=jax.ShapeDtypeStruct((bp, c, dp), u.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(up, dtp, At, Bp, Cp, biasp)
    return out[:b, :l, :d]


def _time(f, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = f(*args)
        np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    b, l, d, n = 1568, 16, 768, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    bf = jnp.bfloat16
    u = jax.random.normal(ks[0], (b, l, d), bf)
    dt = 0.3 * jax.random.uniform(ks[1], (b, l, d), bf)
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n), bf)
    C = jax.random.normal(ks[4], (b, l, n), bf)
    bias = 0.3 * jax.random.uniform(ks[5], (d,))
    io = (4 * b * l * d + 2 * b * l * n) * 2  # one direction

    import os

    modes = (("base", (32, 64)), ("pre_a", (8, 16)), ("pre_a_gy", (8, 16)))
    if os.environ.get("KV_DIAG"):
        modes = (("base", (32,)), ("no_exp", (32,)), ("exp_bf16", (32,)))
    ref = None
    for mode, bts in modes:
        for bt in bts:
            f = jax.jit(functools.partial(run_variant, mode, bt))
            try:
                out = f(u, dt, A, B, C, bias)
                if ref is None:
                    ref = np.asarray(out, np.float32)
                elif mode not in ("no_exp", "exp_bf16"):
                    err = np.abs(np.asarray(out, np.float32) - ref).max()
                    assert err < 0.15, f"mismatch {err}"
                t = _time(f, u, dt, A, B, C, bias)
                print(f"{mode:9s} bt={bt:3d}  {t*1e3:7.3f} ms  "
                      f"{100*io/819e9/t:5.1f}% 1-dir roofline", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{mode:9s} bt={bt:3d}  FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
