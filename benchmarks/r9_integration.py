"""r9: integrated A/B of the round-4 perf changes at the bench operating
point — PatchifyConv (im2col patch embed, benchmarks/r7_patch_embed.py) is
active in both arms; the A/B axis is the spatial-attention path
(attn_flash=None einsum vs "row" head-major whole-row kernel,
benchmarks/r8_attn.py).

Measures TimeMamba-B inference fwd (clips/s) and the full train step
(fwd+bwd+adamw, save_scan remat) for both attention paths.

Run on the chip: python benchmarks/r9_integration.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def main():
    import optax

    from benchmarks.profile_timemamba import timemamba_flops
    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    batch, frames, size = 8, 16, 224
    x0 = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    x1 = jax.random.normal(
        jax.random.PRNGKey(5), (batch, frames, size, size, 3), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2), (batch, 512), jnp.float32)

    for attn in (None, "row"):
        model = TimeMamba(
            img_size=size, patch_size=16, embed_dim=768, depth=12,
            num_heads=12, num_frames=frames, ln_pre=True, output_dim=512,
            impl="pallas", scan_blocks=True, attn_flash=attn,
            dtype=jnp.bfloat16)
        params = model.init({"params": jax.random.PRNGKey(1)}, x0[:1])
        fwd = jax.jit(lambda p, x, m=model: m.apply(p, x))
        _fetch(fwd(params, x0)); _fetch(fwd(params, x1))
        t0 = time.perf_counter()
        iters = 40
        for i in range(iters):
            out = fwd(params, x0 if i % 2 == 0 else x1)
        _fetch(out)
        t = (time.perf_counter() - t0) / iters
        print(f"attn={attn}: inference {t*1e3:.1f} ms = {batch/t:.1f} "
              f"clips/s", flush=True)

        tmodel = TimeMamba(
            img_size=size, patch_size=16, embed_dim=768, depth=12,
            num_heads=12, num_frames=frames, ln_pre=True, output_dim=512,
            impl="pallas", scan_blocks=True, remat=True,
            remat_policy="save_scan", attn_flash=attn, dtype=jnp.bfloat16)
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y, m=tmodel):
            def loss_fn(p):
                out = m.apply(p, x).astype(jnp.float32)
                return jnp.mean((out - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        p2, o2, loss = step(params, opt_state, x0, y)
        _fetch(loss)
        t0 = time.perf_counter()
        for i in range(8):
            p2, o2, loss = step(p2, o2, x0 if i % 2 == 0 else x1, y)
        _fetch(loss)
        t = (time.perf_counter() - t0) / 8
        flops = 3 * timemamba_flops(batch)
        print(f"attn={attn}: train step {t*1e3:.0f} ms = {batch/t:.1f} "
              f"clips/s, {100*flops/t/197e12:.1f}% MFU", flush=True)


if __name__ == "__main__":
    main()
