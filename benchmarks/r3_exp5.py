"""Round-3 TPU experiment batch 5: full model after the bf16 tanh-gelu
switch + clean FusedMHA(einsum) spatial-stack number (flash off).
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


def main():
    from video_mamba_suite_tpu.models.timemamba import Mlp, TimeMamba
    from video_mamba_suite_tpu.models.common import FusedMHA

    D = 768

    # 1. full model fwd with bf16 tanh-gelu (everything else as bench)
    B, T, S = 8, 16, 224
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3),
                          jnp.bfloat16)
    model = TimeMamba(img_size=S, patch_size=16, embed_dim=D, depth=12,
                      num_heads=12, num_frames=T, ln_pre=True, output_dim=512,
                      scan_blocks=True, dtype=jnp.bfloat16, impl="pallas")
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    t = _time(jax.jit(lambda p, v: model.apply(p, v)), params, x, iters=20)
    print(f"1 full TimeMamba-B (tanh-gelu bf16)  {t*1e3:8.2f} ms  "
          f"{B/t:7.1f} clips/s", flush=True)

    # 2. spatial stack with FusedMHA einsum path (flash explicitly off)
    class Spatial(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i in range(12):
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(h)
                h = h + FusedMHA(num_heads=12, dtype=jnp.bfloat16,
                                 flash=False, name=f"attn{i}")(hn)
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(h)
                h = h + Mlp(D * 4, D, dtype=jnp.bfloat16,
                            name=f"mlp{i}")(hn)
            return h

    hs = jax.random.normal(jax.random.PRNGKey(3), (128, 197, D),
                           jnp.bfloat16)
    sp_fl = 12 * (128 * 197 * D * 4 * D * 2 + 128 * 2 * 197 * 197 * D * 2
                  + 128 * 197 * 2 * D * D * 4 * 2)
    m = Spatial()
    p = m.init({"params": jax.random.PRNGKey(1)}, hs[:16])
    t = _time(jax.jit(lambda p, v: m.apply(p, v)), p, hs)
    print(f"2 spatial einsum+tanh-gelu  {t*1e3:8.2f} ms  MFU "
          f"{100*sp_fl/t/197e12:5.1f}%", flush=True)

    # 3. clean flash A/B (the exp2 flash number was contention-tainted)
    class SpatialFlash(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i in range(12):
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(h)
                h = h + FusedMHA(num_heads=12, dtype=jnp.bfloat16,
                                 flash=True, name=f"attn{i}")(hn)
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(h)
                h = h + Mlp(D * 4, D, dtype=jnp.bfloat16,
                            name=f"mlp{i}")(hn)
            return h

    m3 = SpatialFlash()
    p3 = m3.init({"params": jax.random.PRNGKey(1)}, hs[:16])
    t = _time(jax.jit(lambda p, v: m3.apply(p, v)), p3, hs)
    print(f"3 spatial flash+tanh-gelu  {t*1e3:8.2f} ms  MFU "
          f"{100*sp_fl/t/197e12:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
