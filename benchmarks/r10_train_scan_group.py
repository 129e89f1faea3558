"""r10: TRAIN-step scan_group sweep (round-4).

The fresh train xplane (r3_profile_train.py after PatchifyConv) shows the
step is ~97% while-loop time (fwd 81.6 + bwd 251.7 of 345 ms) and the only
recurring non-floor items are the (8,197,16,768) {1,3,2,0}<->{3,2,1,0}
layout copies at the scan-carry boundaries (~14 ms/step summed). Inference
measured scan_group 2/4 at +-2% (r3_scan_group: carry overhead isn't the
fwd bottleneck), but the remat boundary DOUBLES the train-side crossings —
sweep group 1/2/3 on the full train step.

Run on the chip: python benchmarks/r10_train_scan_group.py

RESULT (v5e chip, 2026-08-19): group=1 345 ms, group=2 350 ms,
group=3 346 ms — NEGATIVE. The boundary copies are async-overlapped
(xplane shows copy-start/copy-done pairs riding under compute), so
amortizing the loop carries does not shorten the critical path.
Recorded in BASELINE.md's round-4 train-step re-audit.
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

    from video_mamba_suite_tpu.models.timemamba import TimeMamba

    batch, frames, size = 8, 16, 224
    x0 = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    x1 = jax.random.normal(
        jax.random.PRNGKey(5), (batch, frames, size, size, 3), jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(2), (batch, 512), jnp.float32)

    for group in (1, 2, 3):
        model = TimeMamba(
            img_size=size, patch_size=16, embed_dim=768, depth=12,
            num_heads=12, num_frames=frames, ln_pre=True, output_dim=512,
            impl="pallas", scan_blocks=True, scan_group=group, remat=True,
            remat_policy="save_scan", dtype=jnp.bfloat16)
        params = model.init({"params": jax.random.PRNGKey(1)}, x0[:1])
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y, m=model, tx=tx):
            def loss_fn(p):
                out = m.apply(p, x).astype(jnp.float32)
                return jnp.mean((out - y) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        try:
            p2, o2, loss = step(params, opt_state, x0, y)
            _fetch(loss)
            t0 = time.perf_counter()
            for i in range(10):
                p2, o2, loss = step(p2, o2, x0 if i % 2 == 0 else x1, y)
            _fetch(loss)
            t = (time.perf_counter() - t0) / 10
            print(f"group={group}: train step {t*1e3:.0f} ms = "
                  f"{batch/t:.1f} clips/s", flush=True)
        except Exception as e:
            print(f"group={group}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
