"""Calibrate v5e VPU elementwise op costs (FMA vs exp) with a Pallas kernel.

Times a chained-dependency elementwise loop of length K over a VMEM-resident
fp32 block and fits the slope in K: (time(K2) - time(K1)) / (K2 - K1) per
element-op. This pins the exp:FMA cost ratio used by bench.py's compute-
roofline model for the selective-scan kernel (the recurrence does ~5
mul/FMA-class ops plus one exp per (b,l,n,d) state element).
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS, BLOCKS = 256, 1024, 64  # 16.8M elements, fp32


def _kernel(x_ref, o_ref, *, k: int, op: str):
    x = x_ref[...]
    for _ in range(k):
        if op == "fma":
            # quadratic, NOT x*c+d: an affine chain constant-folds into one
            # op and measures nothing (observed). x² · 0.9 + 0.05 has a
            # stable fixed point ≈ 0.053 — values stay normal.
            x = x * x * 0.9 + 0.05
        else:  # exp — chain converges to the fixed point of exp(x/2 - 1)
            x = jnp.exp(x * 0.5 - 1.0)
    o_ref[...] = x


def timed(op, k, iters=100):
    f = pl.pallas_call(
        functools.partial(_kernel, k=k, op=op),
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS * BLOCKS, COLS), jnp.float32),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (ROWS * BLOCKS, COLS),
                          jnp.float32)
    g = jax.jit(lambda x: f(x))
    # Two timing hazards on the tunneled chip (both observed): identical
    # independent calls get pipelined/deduped to below the HBM floor, and
    # block_until_ready returns early for this workload. Chain each call on
    # the previous output AND materialize a host value as the barrier.
    import numpy as np
    r = g(x)
    _ = np.asarray(r[:1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(r)
    _ = np.asarray(r[:1, :1])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    n_elem = ROWS * COLS * BLOCKS
    for op in ("fma", "exp"):
        t1, t2 = timed(op, 1), timed(op, 33)
        slope = (t2 - t1) / 32
        per_elem_ns = slope / n_elem * 1e9
        eps = n_elem / slope / 1e12
        print(f"{op:4s}: K=1 {t1*1e3:7.3f} ms  K=33 {t2*1e3:7.3f} ms  "
              f"slope {slope*1e6:8.2f} us/op-pass = {eps:6.2f} T elem-op/s",
              flush=True)
