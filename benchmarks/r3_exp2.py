"""Round-3 TPU experiment batch 2: isolate the spatial-stack and scan-kernel
inefficiencies.

A. 12x spatial attn+MLP stack (the 46.6ms / 48.7% MFU component):
   - baseline (exact erf gelu)
   - tanh-approx gelu           (is erf the VPU sink?)
   - identity activation        (upper bound of activation cost)
B. Fused bidir short-kernel standalone at the adapter shape
   (1568, 16, 768): time vs batch-tile bt — is the kernel latency-bound
   (grid too fine) or VPU-bound (bt already saturating)?
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
from flax import linen as nn


def _time(f, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


D = 768


class SpatialOnly(nn.Module):
    act: str = "gelu_exact"

    @nn.compact
    def __call__(self, h):
        from video_mamba_suite_tpu.models.common import FusedMHA
        for i in range(12):
            hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(h)
            h = h + FusedMHA(num_heads=12, dtype=jnp.bfloat16,
                             name=f"attn{i}")(hn)
            hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(h)
            m = nn.Dense(D * 4, dtype=jnp.bfloat16, name=f"fc1_{i}")(hn)
            if self.act == "gelu_exact":
                m = nn.gelu(m, approximate=False)
            elif self.act == "gelu_tanh":
                m = nn.gelu(m, approximate=True)
            h = h + nn.Dense(D, dtype=jnp.bfloat16, name=f"fc2_{i}")(m)
        return h


def part_a():
    B = 8
    hs = jax.random.normal(jax.random.PRNGKey(3), (B * 16, 197, D),
                           jnp.bfloat16)
    sp_fl = 12 * (B * 16 * 197 * D * 4 * D * 2
                  + B * 16 * 2 * 197 * 197 * D * 2
                  + B * 16 * 197 * 2 * D * D * 4 * 2)
    for act in ("gelu_exact", "gelu_tanh", "none"):
        m = SpatialOnly(act=act)
        p = m.init({"params": jax.random.PRNGKey(1)}, hs[:16])
        t = _time(jax.jit(lambda p, v, m=m: m.apply(p, v)), p, hs)
        print(f"A spatial {act:11s} {t*1e3:8.2f} ms  MFU "
              f"{100*sp_fl/t/197e12:5.1f}%", flush=True)


def part_b():
    from video_mamba_suite_tpu.ops import selective_scan_pallas as ssp

    b, t_, d, n = 1568, 16, 768, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    bf = jnp.bfloat16
    uf = jax.random.normal(ks[0], (b, t_, d), bf)
    dtf = 0.3 * jax.random.uniform(ks[1], (b, t_, d), bf)
    Af = -0.5 * jax.random.uniform(ks[2], (d, n))
    Bf = jax.random.normal(ks[3], (b, t_, n), bf)
    Cf = jax.random.normal(ks[4], (b, t_, n), bf)
    Df_ = jax.random.normal(ks[5], (d,))
    zf = jax.random.normal(ks[6], (b, t_, d), bf)
    biasf = 0.3 * jax.random.uniform(ks[7], (d,))

    io_bytes = (8 * b * t_ * d + 4 * b * t_ * n) * 2  # both dirs in+out
    for bt_elems in (256, 512, 1024, 2048):
        bt = max(1, bt_elems * 2 // (16 * 2))

        def run(uf, dtf, Bf, Cf, zf, bt=bt):
            return ssp._short_bidir_core(
                uf, dtf, Af, Bf, Cf, Df_, zf, biasf,
                uf, dtf, Af, Bf, Cf, Df_, zf, biasf,
                True, bt, ssp.DEFAULT_DTILE, False)

        try:
            t = _time(jax.jit(run), uf, dtf, Bf, Cf, zf, iters=50)
            roof = io_bytes / 819e9
            print(f"B bidir kernel bt={bt:3d}  {t*1e3:7.3f} ms  "
                  f"{100*roof/t:5.1f}% roofline", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B bidir kernel bt={bt:3d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    part_a()
    part_b()
