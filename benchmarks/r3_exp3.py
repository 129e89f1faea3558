"""Round-3 TPU experiment batch 3: long-path scan kernel at bf16 I/O.

Sweeps chunk × dtile on the b8/l2048/d1024/n16 bench shape (bf16 inputs,
inference fwd — no checkpoint writes) and reports % of HBM roofline.
Also times the training fwd (with checkpoints) and fwd+bwd at the default
tile to track the full-step picture.
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


def _time(f, *args, iters=60, warmup=3):
    for _ in range(warmup):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from video_mamba_suite_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas,
    )

    b, l, d, n = 8, 2048, 1024, 16
    bf = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = jax.random.normal(ks[0], (b, l, d), bf)
    dt = 0.5 * jax.random.uniform(ks[1], (b, l, d), bf)
    A = -0.5 * jax.random.uniform(ks[2], (d, n))
    B = jax.random.normal(ks[3], (b, l, n), bf)
    C = jax.random.normal(ks[4], (b, l, n), bf)
    D = jax.random.normal(ks[5], (d,))
    z = jax.random.normal(ks[6], (b, l, d), bf)
    bias = 0.5 * jax.random.uniform(ks[7], (d,))

    io = (4 * b * l * d + 2 * b * l * n) * 2
    roof = io / 819e9
    for chunk in (64, 128, 256):
        for dtile in (256, 512):
            f = jax.jit(functools.partial(
                selective_scan_pallas, D=D, z=z, delta_bias=bias,
                delta_softplus=True, chunk=chunk, dtile=dtile))
            try:
                t = _time(f, u, dt, A, B, C)
                print(f"fwd chunk={chunk:3d} dtile={dtile:3d}  "
                      f"{t*1e3:7.3f} ms  {b*l/t/1e6:6.2f} Mtok/s  "
                      f"{100*roof/t:5.1f}% roofline", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"fwd chunk={chunk:3d} dtile={dtile:3d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:110]}", flush=True)

    # training step at default tiles: fwd+bwd wall
    def loss(u, dt, B, C, z):
        out = selective_scan_pallas(u, dt, A, B, C, D=D, z=z,
                                    delta_bias=bias, delta_softplus=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    try:
        t = _time(g, u, dt, B, C, z, iters=20)
        print(f"fwd+bwd default tiles: {t*1e3:7.3f} ms  "
              f"{b*l/t/1e6:6.2f} Mtok/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fwd+bwd FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__":
    main()
