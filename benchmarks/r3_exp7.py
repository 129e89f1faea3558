"""Round-3 TPU experiment 7: short-bwd batch tile — bt=8 (r2 cap) vs
bt=16 + raised scoped-VMEM limit (the r3 decay-recompute freed half the
per-step VMEM; the bench train step then OOMed at the 16 MB default).

Shape = the TimeMamba-B adapter scan at bench batch 8:
rows = 8 clips x 196 spatial tokens = 1568, c = 16 time steps, d = 768,
n = 16, with z gate + bias + softplus (the production call).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from video_mamba_suite_tpu.ops import selective_scan_pallas as sp

b, l, d, n = 1568, 16, 768, 16
rng = jax.random.PRNGKey(0)
ks = jax.random.split(rng, 7)
u = jax.random.normal(ks[0], (b, l, d), jnp.bfloat16)
delta = jax.random.normal(ks[1], (b, l, d), jnp.bfloat16)
A = -0.5 * jax.random.uniform(ks[2], (d, n), jnp.float32)
B = jax.random.normal(ks[3], (b, l, n), jnp.bfloat16)
C = jax.random.normal(ks[4], (b, l, n), jnp.bfloat16)
D = jax.random.normal(ks[5], (d,), jnp.float32)
z = jax.random.normal(ks[6], (b, l, d), jnp.bfloat16)
bias = jnp.full((d,), 0.1, jnp.float32)


def loss(u, delta, B, C, z):
    out = sp.selective_scan_pallas(
        u, delta, A, B, C, D=D, z=z, delta_bias=bias, delta_softplus=True)
    return jnp.sum(out.astype(jnp.float32))


def timeit(fn, args, iters=100):
    fn(*args)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


for label, elems, lim in [
    ("bt=8  (r2 cap, 16MB)", 128, 16 * 1024 * 1024),
    ("bt=16 (r3, 64MB)", 256, 64 * 1024 * 1024),
]:
    sp.SHORT_BT_ELEMS_BWD = elems
    sp.SHORT_BWD_VMEM_LIMIT = lim
    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
    try:
        ms = timeit(lambda *a: grad(*a)[1], (u, delta, B, C, z))
        print(f"{label}: fwd+bwd {ms:7.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
