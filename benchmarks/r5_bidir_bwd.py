"""r5: fused bidirectional bwd kernel — batch-tile sweep + vs-unfused.

Times jax.grad through the bidir scan at the TimeMamba-B adapter shape
(1568 rows, l=16, d=768, n=16, bf16 activations) for several values of the
fused-bwd batch-tile cap, against the flip-based two-kernel path.

Run on the chip: python benchmarks/r5_bidir_bwd.py
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

from video_mamba_suite_tpu.ops import selective_scan_pallas as ssp

B, L, D, N = 1568, 16, 768, 16
BF = jnp.bfloat16


def make_args(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    return dict(
        uf=jax.random.normal(ks[0], (B, L, D), BF),
        dtf=0.5 * jax.random.uniform(ks[1], (B, L, D), BF),
        ub=jax.random.normal(ks[2], (B, L, D), BF),
        dtb=0.5 * jax.random.uniform(ks[3], (B, L, D), BF),
        Bf=jax.random.normal(ks[4], (B, L, N), BF),
        Cf=jax.random.normal(ks[5], (B, L, N), BF),
        Bb=jax.random.normal(ks[6], (B, L, N), BF),
        Cb=jax.random.normal(ks[7], (B, L, N), BF),
        zf=jax.random.normal(ks[8], (B, L, D), BF),
        zb=jax.random.normal(ks[9], (B, L, D), BF),
    )


Af = -0.5 * np.random.default_rng(0).random((D, N)).astype(np.float32)
Ab = -0.5 * np.random.default_rng(1).random((D, N)).astype(np.float32)
Df = np.random.default_rng(2).standard_normal(D).astype(np.float32)
bias = 0.5 * np.random.default_rng(3).random(D).astype(np.float32)


def loss(a):
    yf, yb = ssp.selective_scan_pallas_bidir(
        a["uf"], a["dtf"], Af, a["Bf"], a["Cf"],
        a["ub"], a["dtb"], Ab, a["Bb"], a["Cb"],
        Df=Df, zf=a["zf"], biasf=bias, Db=Df, zb=a["zb"], biasb=bias,
        delta_softplus=True)
    return (jnp.sum(yf.astype(jnp.float32) ** 2)
            + jnp.sum(yb.astype(jnp.float32) ** 2))


def timeit(fn, a0, a1, iters=50):
    np.asarray(jax.tree_util.tree_leaves(fn(a0))[0].ravel()[0])
    np.asarray(jax.tree_util.tree_leaves(fn(a1))[0].ravel()[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(a0 if i % 2 == 0 else a1)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    a0, a1 = make_args(0), make_args(1)
    grad = jax.jit(jax.grad(loss))
    fwd = jax.jit(loss)
    t_fwd = timeit(fwd, a0, a1)
    print(f"fwd only: {t_fwd*1e3:.2f} ms")
    for cap in (64, 128, 256, 512):
        ssp.SHORT_BIDIR_BT_ELEMS_BWD = cap
        g = jax.jit(jax.grad(loss))
        try:
            t = timeit(g, a0, a1)
            print(f"fused bwd cap={cap:4d} (bt={max(1, cap // 16):3d}): "
                  f"{t*1e3:.2f} ms fwd+bwd", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fused bwd cap={cap:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        finally:
            jax.clear_caches()
    ssp.SHORT_BIDIR_BT_ELEMS_BWD = 128

    # flip-based two-kernel baseline
    orig = ssp._short_bidir_core_bwd
    def flip_route(softplus, bt, dtile, interpret, res, cot):
        return ssp._short_bidir_core_bwd_flip(
            softplus, bt, dtile, interpret, res, cot)
    ssp._short_bidir_core.defvjp(ssp._short_bidir_core_fwd, flip_route)
    try:
        t = timeit(jax.jit(jax.grad(loss)), a0, a1)
        print(f"unfused (flip) baseline: {t*1e3:.2f} ms fwd+bwd")
    finally:
        ssp._short_bidir_core.defvjp(ssp._short_bidir_core_fwd, orig)


if __name__ == "__main__":
    main()
