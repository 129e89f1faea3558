"""Sweep the fused-bidir short kernel's batch tile at the adapter shape.

Usage: python benchmarks/sweep_short_bidir.py [--bts 256,512,1024,2048]
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


def _time(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bts", type=str, default="256,512,1024,2048")
    ap.add_argument("--b", type=int, default=1568)
    ap.add_argument("--l", type=int, default=16)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--n", type=int, default=16)
    args = ap.parse_args()

    from video_mamba_suite_tpu.ops import selective_scan_pallas as ssp

    b, l, d, n = args.b, args.l, args.d, args.n
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
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
        f = jax.jit(lambda *a: ssp.selective_scan_pallas_bidir(
            a[0], a[1], A, a[2], a[3], a[0], a[1], A, a[2], a[3],
            Df=D, zf=z, biasf=bias, Db=D, zb=z, biasb=bias,
            delta_softplus=True))
        try:
            t = _time(f, u, dt, B, C)
        except Exception as e:  # VMEM OOM etc.
            print(f"bt_elems={bt_elems:5d} (bt={bt_elems//16:4d}): "
                  f"FAILED {type(e).__name__}", flush=True)
            continue
        print(f"bt_elems={bt_elems:5d} (bt={bt_elems//16:4d}): "
              f"{t*1e3:7.3f} ms  {2*b*l/t/1e6:6.1f} Mtok/s", flush=True)


if __name__ == "__main__":
    main()
