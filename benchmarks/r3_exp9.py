"""Round-3 experiment 9: long-path chunk/dtile re-sweep at bf16 I/O.

At the bench shape (b8 l2048 d1024 n16 bf16) the sequential-chunk kernel
runs bt=8, so each unrolled step touches only bt*n*dtile = 32K lanes at
dtile=256 — small enough that per-step overhead (slicing, bookkeeping)
dominates. dtile directly widens the per-step VPU work without adding
passes; chunk only trades grid steps for program size. Sweeps fwd-only
(the bench path) and fwd+bwd.
"""
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

from video_mamba_suite_tpu.ops.selective_scan_pallas import (
    selective_scan_pallas,
)


def make_args(b=8, l=2048, d=1024, n=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16
    args = (
        jax.random.normal(ks[0], (b, l, d), bf),
        0.5 * jax.random.uniform(ks[1], (b, l, d), bf),
        -0.5 * jax.random.uniform(ks[2], (d, n)),
        jax.random.normal(ks[3], (b, l, n), bf),
        jax.random.normal(ks[4], (b, l, n), bf),
    )
    kw = dict(
        D=jax.random.normal(ks[5], (d,)),
        z=jax.random.normal(ks[6], (b, l, d), bf),
        delta_bias=0.5 * jax.random.uniform(ks[7], (d,)),
        delta_softplus=True,
    )
    return args, kw


def timeit(f, *a, iters=100, warmup=3):
    for _ in range(warmup):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def run(chunk, dtile, mode="fwd"):
    args, kw = make_args()
    b, l = args[0].shape[:2]
    kw2 = dict(kw, chunk=chunk, dtile=dtile)
    try:
        if mode == "fwd":
            f = jax.jit(lambda *a: selective_scan_pallas(*a, **kw2))
            t = timeit(f, *args, iters=100)
        else:
            def loss(*a):
                return jnp.sum(
                    selective_scan_pallas(*a, **kw2).astype(jnp.float32))
            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
            t = timeit(f, *args, iters=30)
        print(f"chunk={chunk:4d} dtile={dtile:5d} {mode:7s}: "
              f"{t*1e3:7.3f} ms = {b*l/t/1e6:6.2f} Mtok/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"chunk={chunk:4d} dtile={dtile:5d} {mode:7s}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    for chunk, dtile in [(64, 256), (64, 512), (64, 1024), (128, 512)]:
        run(chunk, dtile, "fwd")
    for chunk, dtile in [(64, 256), (64, 512)]:
        run(chunk, dtile, "fwdbwd")
