"""Sweep (chunk, dtile) for the long chunked scan at the LM/TAL shape.

Shape: (b=8, l=2048, d=1024, n=16) — the bench.py microbench shape. The
reference CUDA kernel dispatches seqlen-adaptive launch configs
(selective_scan_fwd_kernel.cuh:332-345); chunk/dtile are the TPU analogue.

Usage: python benchmarks/sweep_long_scan.py [--grad]
"""

import argparse
import itertools
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
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--l", type=int, default=2048)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--chunks", default="16,32,64,128")
    ap.add_argument("--dtiles", default="256,512")
    args = ap.parse_args()

    from video_mamba_suite_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas,
    )

    b, l, d, n = args.b, args.l, args.d, args.n
    dt_ = jnp.dtype(args.dtype)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = jax.random.normal(ks[0], (b, l, d), dt_)
    dt = 0.5 * jax.random.uniform(ks[1], (b, l, d), dt_)
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n), dt_)
    C = jax.random.normal(ks[4], (b, l, n), dt_)
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (b, l, d), dt_)
    bias = 0.5 * jax.random.uniform(ks[7], (d,))

    for chunk, dtile in itertools.product(
            map(int, args.chunks.split(",")),
            map(int, args.dtiles.split(","))):
        f = jax.jit(lambda *a, ch=chunk, dtl=dtile: selective_scan_pallas(
            *a, D=D, z=z, delta_bias=bias, delta_softplus=True,
            chunk=ch, dtile=dtl))
        try:
            for _ in range(3):
                _fetch(f(u, dt, A, B, C))
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                out = f(u, dt, A, B, C)
            _fetch(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"chunk={chunk:4d} dtile={dtile:4d}: {ms:7.3f} ms  "
                  f"{b * l / ms * 1e3 / 1e6:7.2f} Mtok/s", flush=True)
        except Exception as e:
            print(f"chunk={chunk:4d} dtile={dtile:4d}: FAILED "
                  f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
