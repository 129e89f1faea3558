"""Round-3 perf exploration: batch sweep + component split on the chip.

Times the full TimeMamba-B fwd at several batch sizes (the bench metric is
clips/s/chip — batch is free), plus the adapter stack and spatial stack at
the winning batch. Skips the assoc variants (minutes of compile, not needed).

Usage: python benchmarks/r3_sweep.py [--batches 8,32] [--components]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _fetch(out):
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32")
    ap.add_argument("--components", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from benchmarks.profile_timemamba import timemamba_flops
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    T, S, D = 16, 224, 768
    peak = 197e12
    tm = dict(img_size=S, patch_size=16, embed_dim=D, depth=12, num_heads=12,
              num_frames=T, ln_pre=True, output_dim=512, scan_blocks=True,
              dtype=jnp.bfloat16, impl="pallas")
    model = TimeMamba(**tm)
    params = None
    for B in batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, S, S, 3),
                              jnp.bfloat16)
        if params is None:
            params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
        f = jax.jit(lambda p, v: model.apply(p, v))
        t = _time(f, params, x, iters=args.iters)
        fl = timemamba_flops(B)
        print(f"full  B={B:3d}  {t*1e3:8.2f} ms  {B/t:7.1f} clips/s  "
              f"MFU {100*fl/t/peak:5.1f}%", flush=True)

    if not args.components:
        return

    from flax import linen as nn

    from video_mamba_suite_tpu.models.mamba import MambaVim

    B = batches[-1]

    class AdapterStack(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i in range(12):
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln{i}")(h)
                h = h + MambaVim(d_model=D, expand=1, impl="pallas",
                                 dtype=jnp.bfloat16, name=f"m{i}")(hn)
            return h

    ha = jax.random.normal(jax.random.PRNGKey(2), (B * 196, T, D),
                           jnp.bfloat16)
    n_tok = B * 196 * T
    dt_rank = 48
    ad_fl = 12 * (n_tok * D * 2 * D * 2 + n_tok * D * D * 2
                  + 2 * (n_tok * D * (dt_rank + 32) * 2
                         + n_tok * dt_rank * D * 2)
                  + 2 * n_tok * 4 * D * 2 + 2 * n_tok * D * 16 * 9)
    m = AdapterStack()
    p = m.init({"params": jax.random.PRNGKey(1)}, ha[:196])
    t = _time(jax.jit(lambda p, v: m.apply(p, v)), p, ha, iters=args.iters)
    print(f"12x adapters (pallas) B={B}  {t*1e3:8.2f} ms  MFU "
          f"{100*ad_fl/t/peak:5.1f}%", flush=True)

    class SpatialOnly(nn.Module):
        @nn.compact
        def __call__(self, h):
            from video_mamba_suite_tpu.models.common import FusedMHA
            for i in range(12):
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln1_{i}")(h)
                h = h + FusedMHA(num_heads=12, dtype=jnp.bfloat16,
                                 name=f"attn{i}")(hn)
                hn = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln2_{i}")(h)
                mm = nn.Dense(D * 4, dtype=jnp.bfloat16, name=f"fc1_{i}")(hn)
                mm = nn.gelu(mm, approximate=False)
                h = h + nn.Dense(D, dtype=jnp.bfloat16, name=f"fc2_{i}")(mm)
            return h

    hs = jax.random.normal(jax.random.PRNGKey(3), (B * T, 197, D),
                           jnp.bfloat16)
    sp_fl = 12 * (B * T * 197 * D * 4 * D * 2 + B * T * 2 * 197 * 197 * D * 2
                  + B * T * 197 * 2 * D * D * 4 * 2)
    m2 = SpatialOnly()
    p2 = m2.init({"params": jax.random.PRNGKey(1)}, hs[:16])
    t = _time(jax.jit(lambda p, v: m2.apply(p, v)), p2, hs, iters=args.iters)
    print(f"12x spatial attn+MLP B={B}  {t*1e3:8.2f} ms  MFU "
          f"{100*sp_fl/t/peak:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
