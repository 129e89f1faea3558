"""Round-3 TPU experiment batch 6: flash block_b retune + adapter profile.

The first flash attempt used block_b=1 (1536 tiny kernel instances); this
sweeps block_b to see if per-instance MXU work was the problem.
"""

import functools
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


def _time(f, *args, iters=40, warmup=3):
    for _ in range(warmup):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def flash_once(q, k, v, block_b):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, Lp, dh = q.shape
    L = 197
    ids = (jnp.arange(Lp) >= L).astype(jnp.int32)[None]
    ids = jnp.broadcast_to(ids, (B, Lp))
    seg = SegmentIds(q=ids, kv=ids)
    blk = min(256, Lp)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=block_b,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    return flash_attention(q, k, v, segment_ids=seg, causal=False,
                           sm_scale=1.0 / math.sqrt(dh), block_sizes=sizes)


def einsum_attn(q, k, v):
    # q/k/v (B, H, L, dh)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(q.shape[-1])
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def main():
    B, H, L, dh = 128, 12, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, L, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, L, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, L, dh), jnp.bfloat16)

    t = _time(jax.jit(einsum_attn), q, k, v)
    print(f"einsum core (256 tokens, 12 layers-worth = x12: "
          f"{12*t*1e3:6.2f} ms)  single {t*1e3:6.3f} ms", flush=True)
    for bb in (1, 4, 8):
        try:
            t = _time(jax.jit(functools.partial(flash_once, block_b=bb)),
                      q, k, v)
            print(f"flash block_b={bb}  single {t*1e3:6.3f} ms "
                  f"(x12 = {12*t*1e3:6.2f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"flash block_b={bb} FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
