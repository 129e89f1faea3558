"""Round-4: VMEM-resident whole-row attention vs the XLA einsum path at the
TimeMamba-B spatial shape (I=B·T=128 instances, 12 heads, 197 tokens, dh 64).

Usage: python benchmarks/r4_attn.py [--iters 200]
"""

import argparse
import math
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

from video_mamba_suite_tpu.ops.vision_attention import vision_mha


def _fetch(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def time_alternating(f, args0, args1, iters):
    _fetch(f(*args0)); _fetch(f(*args1))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*(args0 if i % 2 == 0 else args1))
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--I", type=int, default=128)
    ap.add_argument("--H", type=int, default=12)
    ap.add_argument("--N", type=int, default=197)
    ap.add_argument("--dh", type=int, default=64)
    args = ap.parse_args()
    I, H, N, dh = args.I, args.H, args.N, args.dh

    def mk(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        return tuple(jax.random.normal(k, (I, H, N, dh), jnp.bfloat16)
                     for k in ks)

    a0, a1 = mk(0), mk(1)
    scale = 1.0 / math.sqrt(dh)

    def xla_path(q, k, v):
        s = jnp.einsum("ihqd,ihkd->ihqk", q, k) * scale
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("ihqk,ihkd->ihqd", w, v)

    from video_mamba_suite_tpu.ops.vision_attention import _mha_fwd_impl

    f_xla = jax.jit(xla_path)
    fl = 4 * I * H * N * N * dh
    t_x = time_alternating(f_xla, a0, a1, args.iters)
    print(f"xla einsum: {t_x*1e3:.3f} ms  ({fl/t_x/1e12:.1f} TF/s)")
    o_x = f_xla(*a0).astype(jnp.float32)

    variants = [("loop", None, False)] + [
        ("batched", tiles, True)
        for tiles in [(1, 12), (2, 12), (2, 6), (4, 6), (8, 4)]
    ]
    for name, tiles, batched in variants:
        try:
            f = jax.jit(lambda q, k, v, t=tiles, b=batched: _mha_fwd_impl(
                q, k, v, scale, False, tiles=t, batched=b))
            o_k = f(*a0).astype(jnp.float32)
            rel = float(jnp.abs(o_x - o_k).max() / jnp.abs(o_x).max())
            t_k = time_alternating(f, a0, a1, args.iters)
            print(f"kernel {name} tiles={tiles}: {t_k*1e3:.3f} ms "
                  f"({fl/t_k/1e12:.1f} TF/s) => {t_x/t_k:.2f}x  rel={rel:.1e}")
        except Exception as e:
            print(f"kernel {name} tiles={tiles}: FAILED "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
