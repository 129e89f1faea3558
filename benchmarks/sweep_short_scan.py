"""Sweep the short-seq kernel batch tile at the TimeMamba adapter shape.

Shape: (B·n=1568, T=16, d=768), n=16 states, bf16 in — one direction of one
adapter layer's scan. Prints ms/call and effective VPU element-rate.

Usage: python benchmarks/sweep_short_scan.py [--bts 128,256,512,1024]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bts", type=str, default="64,128,256,512,1024")
    ap.add_argument("--b", type=int, default=1568)
    ap.add_argument("--l", type=int, default=16)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()

    from video_mamba_suite_tpu.ops import selective_scan_pallas as ssp

    b, l, d, n = args.b, args.l, args.d, args.n
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = jax.random.normal(ks[0], (b, l, d), jnp.bfloat16)
    dt = 0.5 * jax.random.uniform(ks[1], (b, l, d), jnp.bfloat16)
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n), jnp.bfloat16)
    C = jax.random.normal(ks[4], (b, l, n), jnp.bfloat16)
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (b, l, d), jnp.bfloat16)
    bias = 0.5 * jax.random.uniform(ks[7], (d,))

    for bt_elems in map(int, args.bts.split(",")):
        ssp.SHORT_BT_ELEMS = bt_elems
        ssp.SHORT_BT_ELEMS_BWD = bt_elems

        if args.grad:
            f = jax.jit(jax.grad(lambda *a: ssp.selective_scan_pallas(
                *a, D=D, z=z, delta_bias=bias, delta_softplus=True
            ).astype(jnp.float32).sum(), argnums=(0, 1)))
        else:
            f = jax.jit(lambda *a: ssp.selective_scan_pallas(
                *a, D=D, z=z, delta_bias=bias, delta_softplus=True))
        for _ in range(3):
            _fetch(f(u, dt, A, B, C))
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = f(u, dt, A, B, C)
        _fetch(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"bt_elems={bt_elems:5d} (bt={max(1, bt_elems // l):4d}): "
              f"{ms:7.3f} ms  {b * l / ms * 1e3 / 1e6:8.2f} Mtok/s",
              flush=True)


if __name__ == "__main__":
    main()
