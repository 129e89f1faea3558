"""Training-step throughput on the chip: CLIP-TimeMamba-B pretraining and
ViViM-T K400 finetuning, the two raw-video trainer hot loops (BASELINE.md
training-side evidence; the reference publishes no step timings).

Also re-measures the long-context scaling point (1M-token MambaVim forward)
on the reworked sequential-chunk kernel.

Usage: python benchmarks/bench_training.py [--skip-long]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _fetch(out):
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def _time(f, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _fetch(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters


def bench_clip_pretrain(batch=8, frames=16, size=224, ctx=77):
    """One optimizer step of CLIP(TimeMamba-B, 12-layer text) pretraining."""
    from video_mamba_suite_tpu.models.clip import CLIP
    from video_mamba_suite_tpu.tasks.egocentric.train import ClipPretrainer

    model = CLIP(
        embed_dim=512, vision_tower="timemamba",
        vision_cfg=dict(img_size=size, patch_size=16, embed_dim=768, depth=12,
                        num_heads=12, num_frames=frames, ln_pre=True,
                        scan_blocks=True, remat=True,
                        remat_policy="save_scan", dtype=jnp.bfloat16,
                        impl="pallas"),
        text_cfg=dict(context_length=ctx, vocab_size=49408, width=512,
                      heads=8, layers=12),
    )
    tr = ClipPretrainer(model)
    videos = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    texts = jax.random.randint(jax.random.PRNGKey(1), (batch, ctx), 0, 49408)
    tr.init(videos[:1], texts[:1])

    def step(v, t):
        tr.train_step(v, t)
        return tr.params["params"]["logit_scale"]

    t = _time(step, videos, texts, iters=8)
    print(f"[train] CLIP TimeMamba-B pretrain step (b{batch}, {frames}f, "
          f"remat): {t*1e3:.0f} ms → {batch/t:.1f} clips/s/chip", flush=True)


def bench_vivim_finetune(batch=8, frames=16, size=224, n_cls=400):
    """One optimizer step of ViViM-T K400 finetuning (soft-target CE)."""
    import optax

    from video_mamba_suite_tpu.models.vivim import ViViM

    model = ViViM(img_size=size, patch_size=16, num_frames=frames, depth=24,
                  embed_dim=192, num_classes=n_cls, scan_blocks=True,
                  remat=True, impl="pallas")
    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, frames, size, size, 3), jnp.bfloat16)
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, n_cls), n_cls)
    params = model.init({"params": jax.random.PRNGKey(2)}, x[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x).astype(jnp.float32)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * y, -1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _o
        return _o.apply_updates(params, updates), opt_state, loss

    def run(x, y):
        nonlocal params, opt_state
        params, opt_state, loss = step(params, opt_state, x, y)
        return loss

    t = _time(run, x, y, iters=8)
    print(f"[train] ViViM-T K400 finetune step (b{batch}, {frames}f, remat): "
          f"{t*1e3:.0f} ms → {batch/t:.1f} clips/s/chip", flush=True)


def bench_tal_train(batch=2, seq_len=2304, feat_dim=2048, n_cls=20):
    """One TAL (ActionMamba) optimizer step at the THUMOS operating point
    (mamba_thumos_new.yaml: batch 2, max_seq_len 2304, InternVideo2 2048-d
    features, DBM mixers) — the suite's long-sequence training path through
    the chunked Pallas kernels fwd+bwd."""
    import numpy as np

    from video_mamba_suite_tpu.tasks.tal.data import (
        collate_tal,
        make_synthetic_tal,
    )
    from video_mamba_suite_tpu.tasks.tal.train import TalTrainer

    items = make_synthetic_tal(num_videos=2 * batch, num_classes=n_cls,
                               feat_dim=feat_dim, seq_len=seq_len)
    tr = TalTrainer(input_dim=feat_dim, num_classes=n_cls,
                    max_seq_len=seq_len, embd_dim=512, mixer="dbm",
                    impl="pallas")
    batch_arrays = collate_tal(items[:batch], seq_len, tr.max_num_gt,
                               training=True)
    # stage the batch on device once: numpy inputs would re-ship 38 MB of
    # features per step, which on THIS box rides the tunneled transport at
    # ~2 s/step and buries the 18 ms of device compute (xplane-verified);
    # a real input pipeline overlaps host→device copies
    batch_arrays = jax.device_put(batch_arrays)

    def step(*a):
        losses = tr.train_step(*a)
        return np.float32(losses["final_loss"])

    t = _time(step, *batch_arrays, iters=8)
    print(f"[train] TAL ActionMamba step (b{batch}, l{seq_len}, dbm): "
          f"{t*1e3:.0f} ms → {batch/t:.1f} videos/s/chip", flush=True)
    return t


def bench_long_context(l=1_048_576, d=384, n=16):
    """1M-token bidirectional MambaVim forward (the TimeMamba 5000-frame
    self-test scaled up, timemamba.py:392-400).

    MambaVim is shape-preserving, so the timing loop CHAINS each call on
    the previous output (x = f(p, x)) — a true data dependence. The
    original identical-dispatch loop read this point at 8.9 Mtok/s, 2.9x
    faster than the device-serial time (a single direction's scan alone
    measures ~107 ms): the BASELINE.md pipelining/dedup artifact at full
    scale (benchmarks/r13b_long_chained.py)."""
    from video_mamba_suite_tpu.models.mamba import MambaVim

    model = MambaVim(d_model=d, expand=2, impl="pallas", dtype=jnp.bfloat16,
                     fuse_scan=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, l, d), jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:, :256])
    f = jax.jit(lambda p, x: model.apply(p, x))
    for _ in range(2):
        x = f(params, x)
    _fetch(x)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        x = f(params, x)
    _fetch(x)
    t = (time.perf_counter() - t0) / iters
    print(f"[long] MambaVim d{d} fwd at {l/1e6:.1f}M tokens: {t*1e3:.0f} ms "
          f"→ {l/t/1e6:.1f} Mtok/s/chip (chained)", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-long", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()
    if not args.skip_long:
        bench_long_context()
    if not args.skip_train:
        bench_vivim_finetune()
        bench_clip_pretrain()
        bench_tal_train()


if __name__ == "__main__":
    main()
