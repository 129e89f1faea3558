"""Round-3 experiment 10: fused-bidir short-path (bt, dtile) sweep at the
TimeMamba adapter shape (rows=1568, t=16, d=768, n=16, bf16) — the kernel
behind ~20 ms of the 81 ms headline forward. Wider tiles cut per-step
dispatch overhead; VMEM caps the product. Times fwd only (the bench path)
and fwd+bwd at the winning fwd tile.
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

from video_mamba_suite_tpu.ops import selective_scan_pallas as ssp


def make_args(rows=1568, t=16, d=768, n=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    bf = jnp.bfloat16
    def direction(o):
        return (
            jax.random.normal(ks[o], (rows, t, d), bf),
            0.5 * jax.random.uniform(ks[o + 1], (rows, t, d), bf),
            -0.5 * jax.random.uniform(ks[o + 2], (d, n)),
            jax.random.normal(ks[o + 3], (rows, t, n), bf),
            jax.random.normal(ks[o + 4], (rows, t, n), bf),
            jax.random.normal(ks[o + 5], (d,)),
            jax.random.normal(ks[o + 6], (rows, t, d), bf),
            0.5 * jax.random.uniform(ks[o + 7], (d,)),
        )
    return direction(0), direction(8)


def timeit(f, *a, iters=100, warmup=3):
    for _ in range(warmup):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def run(bt, dtile, mode="fwd"):
    (uf, dtf, Af, Bf, Cf, Df, zf, bf_), (ub, dtb, Ab, Bb, Cb, Db, zb, bb_) = \
        make_args()
    rows, t = uf.shape[:2]

    def core(*a16):
        return ssp._short_bidir_core(*a16, True, bt, dtile, False)

    try:
        if mode == "fwd":
            f = jax.jit(lambda *a: core(*a))
            tm = timeit(f, uf, dtf, Af, Bf, Cf, Df, zf, bf_,
                        ub, dtb, Ab, Bb, Cb, Db, zb, bb_, iters=100)
        else:
            def loss(*a16):
                of, ob = core(*a16)
                return (jnp.sum(of.astype(jnp.float32))
                        + jnp.sum(ob.astype(jnp.float32)))
            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 8, 9, 10)))
            tm = timeit(f, uf, dtf, Af, Bf, Cf, Df, zf, bf_,
                        ub, dtb, Ab, Bb, Cb, Db, zb, bb_, iters=30)
        print(f"bt={bt:3d} dtile={dtile:4d} {mode:7s}: {tm*1e3:7.3f} ms "
              f"(= {12*tm*1e3:5.1f} ms / 12 layers)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bt={bt:3d} dtile={dtile:4d} {mode:7s}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    for bt, dtile in [(32, 256), (32, 384), (64, 256), (64, 384),
                      (32, 768), (16, 768), (128, 256)]:
        run(bt, dtile, "fwd")
    for bt, dtile in [(32, 256), (32, 384)]:
        run(bt, dtile, "fwdbwd")
