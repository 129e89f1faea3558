"""Round-3 TPU experiment batch 4: flash-attention FusedMHA.

1. Correctness: flash path vs einsum path on the chip (same device).
2. Speed: 12x spatial stack with flash vs einsum.
3. Full TimeMamba-B fwd with the flash path (auto on TPU).
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


D = 768


class Spatial(nn.Module):
    flash: bool = False

    @nn.compact
    def __call__(self, h):
        from video_mamba_suite_tpu.models.common import FusedMHA
        for i in range(12):
            hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(h)
            h = h + FusedMHA(num_heads=12, dtype=jnp.bfloat16,
                             flash=self.flash, name=f"attn{i}")(hn)
            hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(h)
            m = nn.Dense(D * 4, dtype=jnp.bfloat16, name=f"fc1_{i}")(hn)
            m = nn.gelu(m, approximate=False)
            h = h + nn.Dense(D, dtype=jnp.bfloat16, name=f"fc2_{i}")(m)
        return h


def main():
    from video_mamba_suite_tpu.models.common import FusedMHA

    # 1. correctness on-chip, single layer
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 197, D), jnp.bfloat16)
    m_e = FusedMHA(num_heads=12, dtype=jnp.bfloat16, flash=False)
    m_f = FusedMHA(num_heads=12, dtype=jnp.bfloat16, flash=True)
    p = m_e.init(jax.random.PRNGKey(1), x)
    oe = np.asarray(jax.jit(lambda p, x: m_e.apply(p, x))(p, x), np.float32)
    of = np.asarray(jax.jit(lambda p, x: m_f.apply(p, x))(p, x), np.float32)
    err = np.abs(oe - of).max() / max(np.abs(oe).max(), 1e-6)
    print(f"1 flash-vs-einsum rel err: {err:.2e}", flush=True)

    # 2. spatial stack speed
    hs = jax.random.normal(jax.random.PRNGKey(3), (128, 197, D), jnp.bfloat16)
    sp_fl = 12 * (128 * 197 * D * 4 * D * 2 + 128 * 2 * 197 * 197 * D * 2
                  + 128 * 197 * 2 * D * D * 4 * 2)
    for flash in (False, True):
        m = Spatial(flash=flash)
        pp = m.init({"params": jax.random.PRNGKey(1)}, hs[:16])
        t = _time(jax.jit(lambda p, v, m=m: m.apply(p, v)), pp, hs)
        print(f"2 spatial flash={flash}  {t*1e3:8.2f} ms  MFU "
              f"{100*sp_fl/t/197e12:5.1f}%", flush=True)

    # 3. full model with auto flash
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    B, T, S = 8, 16, 224
    xx = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3),
                           jnp.bfloat16)
    model = TimeMamba(img_size=S, patch_size=16, embed_dim=D, depth=12,
                      num_heads=12, num_frames=T, ln_pre=True, output_dim=512,
                      scan_blocks=True, dtype=jnp.bfloat16, impl="pallas")
    params = model.init({"params": jax.random.PRNGKey(1)}, xx[:1])
    t = _time(jax.jit(lambda p, v: model.apply(p, v)), params, xx, iters=20)
    print(f"3 full TimeMamba-B (flash auto)  {t*1e3:8.2f} ms  "
          f"{B/t:7.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
