"""Batch-size scaling of TimeMamba-B inference + scan-only cost at the
adapter shape. One process (single tunneled chip — no concurrent TPU runs).

Usage: python benchmarks/sweep_timemamba_batch.py [--batches 8,16,32]
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


def _time(f, *args, iters=15, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def scan_only(batch=8):
    """Fused-bidir scan at the TimeMamba adapter shape (B·n, 16, 768)."""
    from video_mamba_suite_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas_bidir,
    )

    b, l, d, n = batch * 196, 16, 768, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    mk = lambda k, shape, dt=jnp.bfloat16: jax.random.normal(k, shape, dt)  # noqa: E731
    u = mk(ks[0], (b, l, d))
    dt = 0.5 * jax.random.uniform(ks[1], (b, l, d), jnp.bfloat16)
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = mk(ks[3], (b, l, n))
    C = mk(ks[4], (b, l, n))
    D = mk(ks[5], (d,), jnp.float32)
    z = mk(ks[6], (b, l, d))
    bias = 0.5 * jax.random.uniform(ks[7], (d,))

    f = jax.jit(lambda *a: selective_scan_pallas_bidir(
        a[0], a[1], A, a[2], a[3], a[0], a[1], A, a[2], a[3],
        Df=D, zf=z, biasf=bias, Db=D, zb=z, biasb=bias,
        delta_softplus=True))
    t = _time(f, u, dt, B, C)
    tok = b * l
    # minimal VPU elem-ops: ~8 per (token·n·dir) per d element
    ops = 2 * tok * n * d * 8
    print(f"[scan-only bidir] B·n={b} l={l} d={d}: {t*1e3:.2f} ms/call "
          f"({2*tok/t/1e6:.1f} Mtok/s both dirs, "
          f"{ops/t/1e12:.2f} effective Tops/s)", flush=True)
    return t


def model_batch(batch, frames=16, size=224, scan_blocks=True):
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    model = TimeMamba(
        img_size=size, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        num_frames=frames, ln_pre=True, output_dim=512, impl="pallas",
        scan_blocks=scan_blocks, dtype=jnp.bfloat16,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t = _time(fwd, params, x, iters=10)
    print(f"[timemamba-b] batch={batch} scan_blocks={scan_blocks}: "
          f"{t*1e3:.1f} ms → {batch/t:.1f} clips/s", flush=True)
    del params, x
    return batch / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16,32")
    ap.add_argument("--scan-only", action="store_true")
    ap.add_argument("--unrolled", action="store_true")
    ap.add_argument("--skip-scan", action="store_true")
    args = ap.parse_args()
    if not args.skip_scan:
        scan_only()
    for b in map(int, args.batches.split(",")):
        model_batch(b, scan_blocks=not args.unrolled)


if __name__ == "__main__":
    main()
