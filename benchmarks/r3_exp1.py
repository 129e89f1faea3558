"""Round-3 TPU experiment batch 1: while-carry amortization + bf16 params.

Variants, each timed on the chip in ONE process (amortizes startup), with
the persistent compilation cache enabled (if the axon PJRT supports it,
future runs skip the multi-minute remote compiles entirely):
  1. group=1 baseline          (r2 config)
  2. group=1 + bf16 params     (inference-cast weights: half the weight
                                traffic + half the scanned-param slices)
  3. group=4                   (3 while iterations instead of 12)
  4. group=4 + bf16 params
  5. unrolled + bf16 params    (no while loop at all; may 413)
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


def _time(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    B, T, S, D = 8, 16, 224, 768
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3), jnp.bfloat16)
    base = dict(img_size=S, patch_size=16, embed_dim=D, depth=12,
                num_heads=12, num_frames=T, ln_pre=True, output_dim=512,
                dtype=jnp.bfloat16, impl="pallas")

    def cast_bf16(p):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, p)

    variants = [
        ("group=1 fp32p", dict(scan_blocks=True, scan_group=1), False),
        ("group=1 bf16p", dict(scan_blocks=True, scan_group=1), True),
        ("group=4 fp32p", dict(scan_blocks=True, scan_group=4), False),
        ("group=4 bf16p", dict(scan_blocks=True, scan_group=4), True),
        ("unrolled bf16p", dict(scan_blocks=False), True),
    ]
    for name, kw, bf16p in variants:
        t_start = time.perf_counter()
        try:
            model = TimeMamba(**base, **kw)
            params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
            if bf16p:
                params = cast_bf16(params)
            f = jax.jit(lambda p, v, m=model: m.apply(p, v))
            t = _time(f, params, x)
            print(f"{name:18s} {t*1e3:8.2f} ms  {B/t:7.1f} clips/s  "
                  f"(setup {time.perf_counter()-t_start:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
