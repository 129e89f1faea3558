"""Round-6: spatial-attention fwd+BWD comparison at the TimeMamba-B shape.

Prior rounds established XLA's einsum path wins the attention FORWARD at
(I=128, N=197, h12, dh64) — r3_exp11, r4_attn. Training is a different
trade: the einsum bwd materializes d(scores) (B,t,h,197,197) through HBM
(~600 MB/layer of extra traffic) while the Pallas flash bwd recomputes
in-VMEM. This measures value_and_grad of one attention sandwich:

  A: patch-major einsum (FusedMHA seq_axis=1 — the production layout)
  B: flattened einsum (FusedMHA default)
  C: flattened Pallas flash (FusedMHA flash=True)

Usage: python benchmarks/r6_attn_train.py
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

from video_mamba_suite_tpu.models.common import FusedMHA


def _fetch(x):
    import numpy as np

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def bench(label, module, shape, iters=50):
    x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    x1 = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    params = module.init(jax.random.PRNGKey(2), x0)

    @jax.jit
    def step(p, x):
        def loss(p):
            out = module.apply(p, x).astype(jnp.float32)
            return jnp.mean(out * out)

        l, g = jax.value_and_grad(loss)(p)
        return l

    _fetch(step(params, x0))
    _fetch(step(params, x1))
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(params, x0 if i % 2 == 0 else x1)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.2f} ms fwd+bwd")
    return dt


def main():
    B, n1, t, D, H = 8, 197, 16, 768, 12
    bench("A patch-major einsum (B,197,16,768)",
          FusedMHA(num_heads=H, dtype=jnp.bfloat16, seq_axis=1),
          (B, n1, t, D))
    bench("B flattened einsum   (128,197,768)",
          FusedMHA(num_heads=H, dtype=jnp.bfloat16),
          (B * t, n1, D))
    bench("C flattened flash    (128,197,768)",
          FusedMHA(num_heads=H, dtype=jnp.bfloat16, flash=True),
          (B * t, n1, D))


if __name__ == "__main__":
    main()
