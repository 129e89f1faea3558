"""Round-3: xplane profile of the TimeMamba-B TRAIN step (the bench.py
train leg: fwd+bwd+adamw, remat, bf16, batch 8) — top HLO ops by device
time, to rank the bwd-path time sinks.

Usage: python benchmarks/r3_profile_train.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import optax

from benchmarks.xplane_top import profile_fn
from video_mamba_suite_tpu.models.timemamba import TimeMamba


def main():
    batch, frames, size = 8, 16, 224
    model = TimeMamba(
        img_size=size, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        num_frames=frames, ln_pre=True, output_dim=512, impl="pallas",
        scan_blocks=True, remat=True, remat_policy="save_scan",
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2), (batch, 512), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply(p, x).astype(jnp.float32)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    profile_fn(lambda p, o: step(p, o, x, y)[2], params, opt_state,
               iters=3, top=45)


if __name__ == "__main__":
    main()
