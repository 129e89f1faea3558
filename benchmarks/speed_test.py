"""Backbone throughput/memory microbenchmarks.

Capability match for /root/reference/video-mamba-suite/action-recognition/
models/speed_test.py:26-80 (+ the __main__ blocks in timemamba.py:391-434 and
mamba_new.py:380-423): forward/backward throughput and live-memory for the
video backbones and the raw mixers at growing sequence lengths.

Usage: python benchmarks/speed_test.py [--what mixer|vivim|timemamba]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from video_mamba_suite_tpu.utils.profiling import live_memory_bytes


def _fetch(out):
    """Reliable sync: host-fetch one scalar (block_until_ready can no-op
    under the tunneled axon platform for large outputs)."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _timeit(f, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def bench_mixer(seqlens=(512, 2048, 8192, 32768), d_model=768):
    """Mixer fwd+bwd tokens/sec vs seqlen (the linear-scaling headline —
    timemamba.py:392 self-tests 5000-frame ≈ 1e6-token sequences)."""
    from video_mamba_suite_tpu.models import MambaVim

    for L in seqlens:
        model = MambaVim(d_model=d_model)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, L, d_model))
        params = model.init(jax.random.PRNGKey(1), x)

        def loss(p, x):
            return jnp.sum(model.apply(p, x) ** 2)

        g = jax.jit(jax.grad(loss))
        t = _timeit(g, params, x)
        mem = live_memory_bytes()
        mem_s = f", {mem / 2**30:.2f} GiB" if mem else ""
        print(f"MambaVim L={L}: fwd+bwd {L / t / 1e6:.2f}M tok/s{mem_s}")


def bench_backbone(which: str, frames=16, size=224, batch=4):
    if which == "vivim":
        from video_mamba_suite_tpu.models.vivim import vivim_tiny

        model = vivim_tiny(num_frames=frames, num_classes=400)
    else:
        from video_mamba_suite_tpu.models.timemamba import TimeMamba

        model = TimeMamba(num_frames=frames, scan_blocks=True)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16
    )
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t = _timeit(fwd, params, x)
    print(f"{which} {frames}f {size}px: {batch / t:.2f} clips/s")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="mixer",
                   choices=["mixer", "vivim", "timemamba"])
    a = p.parse_args()
    if a.what == "mixer":
        bench_mixer()
    else:
        bench_backbone(a.what)
