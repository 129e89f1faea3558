"""Round-3 experiment 11: flash-attention block-size sweep at the TimeMamba
spatial shape (B·t=128 instances, 197 tokens -> padded 256, 12 heads, 64
dh, bf16) vs the XLA einsum path. exp6 got flash within 13% at block_b=8;
this sweeps block_b x block_q/k to see if any config beats the einsum's
score-tensor HBM round-trip (~160 MB/layer physical).
"""
import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

B, L, H, dh = 128, 197, 12, 64
Lp = 256


def fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])


def mk(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, Lp, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, Lp, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, Lp, dh), jnp.bfloat16)
    return q, k, v


A0, A1 = mk(0), mk(1)


def timeit(f, iters=100):
    fetch(f(*A0)); fetch(f(*A1))
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(*(A0 if i % 2 == 0 else A1))
    fetch(out)
    return (time.perf_counter() - t0) / iters


def einsum_path(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / math.sqrt(dh))
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


t = timeit(jax.jit(einsum_path))
print(f"einsum (Lp=256)                    : {t*1e3:7.3f} ms "
      f"(= {12*t*1e3:5.1f} ms/12 layers)", flush=True)

from jax.experimental.pallas.ops.tpu.flash_attention import (  # noqa: E402
    BlockSizes, flash_attention,
)

for bb, bq, bk in [(8, 256, 256), (16, 256, 256), (32, 256, 256),
                   (64, 256, 256), (16, 128, 256), (32, 128, 128)]:
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    f = jax.jit(lambda q, k, v, s=sizes: flash_attention(
        q, k, v, sm_scale=1.0 / math.sqrt(dh), block_sizes=s))
    try:
        t = timeit(f)
        print(f"flash bb={bb:3d} bq={bq:3d} bk={bk:3d}       : {t*1e3:7.3f} ms "
              f"(= {12*t*1e3:5.1f} ms/12 layers)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"flash bb={bb:3d} bq={bq:3d} bk={bk:3d}       : FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
