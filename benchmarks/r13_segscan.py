"""r13: segment-parallel two-pass scan A/B at the 1M-token shape.

Isolates the raw selective_scan at (b=1, L=2^20, d_inner=768, n=16) —
segmented route vs the Hillis–Steele route — plus the surrounding
MambaVim ops (conv, projections, flips) to locate the remaining time in
the 1M-token standing point (bench_training.bench_long_context).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def _time(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain on the previous output to defeat dispatch dedup (BASELINE rule)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import video_mamba_suite_tpu.ops.selective_scan_pallas as sp

    b, l, d, n = 1, 1 << 20, 768, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    u = jax.random.normal(ks[0], (b, l, d), jnp.bfloat16)
    delta = 0.1 * jax.random.uniform(ks[1], (b, l, d), jnp.bfloat16)
    A = -0.5 * jax.random.uniform(ks[2], (d, n), jnp.float32)
    B = jax.random.normal(ks[3], (b, l, n), jnp.bfloat16)
    C = jax.random.normal(ks[4], (b, l, n), jnp.bfloat16)

    @jax.jit
    def seg(u, delta, B, C):
        return sp.selective_scan_pallas(u, delta, A, B, C,
                                        delta_softplus=True)

    t = _time(seg, u, delta, B, C)
    print(f"[r13] segmented scan  b{b} l{l} d{d} n{n}: {t*1e3:7.1f} ms "
          f"({b*l/t/1e6:.1f} Mtok/s)", flush=True)

    @jax.jit
    def hs(u, delta, B, C):
        # bypass the segmented dispatch: call the core the HS route uses
        chunk = min(sp.DEFAULT_CHUNK, sp.HS_CHUNK)
        out, _ = sp._scan_core(
            u, delta, A, B[:, :, None], C[:, :, None], None, None, None,
            None, True, chunk, sp.DEFAULT_DTILE, False)
        return out

    t = _time(hs, u, delta, B, C)
    print(f"[r13] hillis-steele   b{b} l{l} d{d} n{n}: {t*1e3:7.1f} ms "
          f"({b*l/t/1e6:.1f} Mtok/s)", flush=True)

    # surrounding MambaVim ops at the model shape (d_model=384, expand=2)
    from video_mamba_suite_tpu.ops import causal_conv1d_ref as causal_conv1d

    w = jax.random.normal(jax.random.PRNGKey(7), (4, d), jnp.float32)

    @jax.jit
    def conv(x):
        return causal_conv1d(x, w, None, activation="silu")

    t = _time(conv, u)
    print(f"[r13] causal_conv1d (w4 silu): {t*1e3:7.1f} ms", flush=True)

    @jax.jit
    def flip(x):
        return jnp.flip(x, axis=1) + 0.0

    t = _time(flip, u)
    print(f"[r13] flip (b,l,768) bf16:     {t*1e3:7.1f} ms", flush=True)

    wm = jax.random.normal(jax.random.PRNGKey(8), (384, 2 * 2 * 384),
                           jnp.bfloat16)
    x384 = jax.random.normal(jax.random.PRNGKey(9), (b, l, 384), jnp.bfloat16)

    @jax.jit
    def inproj(x):
        return x @ wm

    t = _time(inproj, x384)
    print(f"[r13] in_proj 384->1536 matmul: {t*1e3:6.1f} ms", flush=True)

    wx = jax.random.normal(jax.random.PRNGKey(10), (d, 24 + 2 * n),
                           jnp.bfloat16)

    @jax.jit
    def xproj(x):
        return x @ wx

    t = _time(xproj, u)
    print(f"[r13] x_proj 768->56 matmul:    {t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
