"""r13b: honest chained A/B of the 1M-token MambaVim standing point.

The round-5 gate baseline (8.9 Mtok/s) came from bench_training._time's
*identical-dispatch* loop, which BASELINE.md's timing-methodology note says
can read below the serial device time on the tunneled chip. MambaVim is a
shape-preserving mixer, so the fwd can be chained (x = f(params, x)) — a
true data dependence that defeats dispatch pipelining/dedup. This A/Bs the
segmented two-pass scan route vs the small-batch Hillis–Steele route for
the full bidirectional model under BOTH timing loops in one process.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _fetch(out):
    import numpy as np

    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _time_identical(f, *args, iters=5, warmup=2):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def _time_chained(f, params, x, iters=5, warmup=2):
    for _ in range(warmup):
        x = f(params, x)
    _fetch(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(params, x)
    _fetch(x)
    return (time.perf_counter() - t0) / iters


def main():
    import video_mamba_suite_tpu.ops.selective_scan_pallas as sp
    from video_mamba_suite_tpu.models.mamba import MambaVim

    l, d = 1_048_576, 384
    model = MambaVim(d_model=d, expand=2, impl="pallas", dtype=jnp.bfloat16,
                     fuse_scan=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, l, d), jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:, :256])
    f = jax.jit(lambda p, x: model.apply(p, x))

    seg_min = sp.SEG_MIN_SEQ
    for route, thresh in (("segmented", seg_min), ("hillis-steele", 1 << 62)):
        sp.SEG_MIN_SEQ = thresh
        f.clear_cache() if hasattr(f, "clear_cache") else None
        g = jax.jit(lambda p, x: model.apply(p, x))
        ti = _time_identical(g, params, x)
        tc = _time_chained(g, params, x)
        print(f"[r13b] {route:14s} identical {ti*1e3:6.0f} ms "
              f"({l/ti/1e6:4.1f} Mtok/s) | chained {tc*1e3:6.0f} ms "
              f"({l/tc/1e6:4.1f} Mtok/s)", flush=True)
    sp.SEG_MIN_SEQ = seg_min


if __name__ == "__main__":
    sys.exit(main())
