"""True in-jit cost of the fused-bidir short kernel: 12 chained calls in ONE
jit (the model's shape of use), vs the full adapter stack, vs matmuls alone.

Usage: python benchmarks/chain_short_bidir.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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


def main():
    from video_mamba_suite_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas_bidir,
    )

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

    def chain(u, dt, B, C, z):
        x = u
        for _ in range(12):
            yf, yb = selective_scan_pallas_bidir(
                x, dt, A, B, C, x, dt, A, B, C,
                Df=D, zf=z, biasf=bias, Db=D, zb=z, biasb=bias,
                delta_softplus=True)
            x = (yf + yb).astype(jnp.bfloat16)
        return x

    t = _time(jax.jit(chain), u, dt, B, C, z)
    print(f"[chain12 bidir] {t*1e3:.2f} ms total → {t/12*1e3:.3f} ms/call "
          f"({2*b*l*12/t/1e6:.1f} Mtok/s)", flush=True)

    # matmul-only stack at the adapter shape: in_proj + x_proj/dt_proj ×2 +
    # out_proj per layer — what the ViM layer does besides the scan
    kk = jax.random.split(jax.random.PRNGKey(1), 5)
    Win = jax.random.normal(kk[0], (d, 2 * d), jnp.bfloat16) * 0.02
    Wx = jax.random.normal(kk[1], (d, 80), jnp.bfloat16) * 0.02
    Wdt = jax.random.normal(kk[2], (48, d), jnp.bfloat16) * 0.02
    Wout = jax.random.normal(kk[3], (d, d), jnp.bfloat16) * 0.02

    def mm_stack(x):
        for _ in range(12):
            xz = x @ Win
            xx = xz[..., :d]
            for _ in range(2):
                dbl = xx @ Wx
                ddt = dbl[..., :48] @ Wdt
                xx = xx + ddt
            x = (xx @ Wout).astype(jnp.bfloat16)
        return x

    tm = _time(jax.jit(mm_stack), u)
    print(f"[matmuls12] {tm*1e3:.2f} ms total", flush=True)


if __name__ == "__main__":
    main()
