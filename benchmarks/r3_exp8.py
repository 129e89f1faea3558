"""Round-3 experiment 8: TimeMamba-B train-step remat strategy sweep.

bench.py's train leg remats WHOLE blocks (recompute = a full second fwd,
matmuls included). Batch 8 activations may simply fit in the 16 GB HBM
(remat off), or a dots_saveable policy can keep MXU outputs and recompute
only the elementwise work. Measures ms/step + clips/s for each.
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
import optax

from video_mamba_suite_tpu.models.timemamba import TimeMamba


def run(label, remat, policy, batch=8, iters=10):
    model = TimeMamba(
        img_size=224, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        num_frames=16, ln_pre=True, output_dim=512, impl="pallas",
        scan_blocks=True, remat=remat, remat_policy=policy,
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, 16, 224, 224, 3), jnp.bfloat16)
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

    try:
        params, opt_state, loss = step(params, opt_state, x, y)
        np.asarray(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, x, y)
        np.asarray(loss)
        t = (time.perf_counter() - t0) / iters
        print(f"{label:42s}: {t*1e3:6.1f} ms/step = {batch/t:5.1f} clips/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label:42s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    run("remat=True (r2 baseline)", True, None)
    run("remat=False (no recompute)", False, None)
    run("remat=True policy=dots_saveable", True, "dots_saveable")
    run("remat=True policy=dots_with_no_batch_dims_saveable", True,
        "dots_with_no_batch_dims_saveable")
