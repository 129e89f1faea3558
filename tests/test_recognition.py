"""End-to-end recognition: ViViM classifier learns synthetic video classes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models.vivim import ViViM
from video_mamba_suite_tpu.tasks.recognition import RecognitionTrainer


def _make_videos(rng, n, num_classes, T=2, S=32):
    """Class-specific spatial frequency pattern + noise."""
    labels = rng.integers(0, num_classes, n)
    xs = np.linspace(0, 2 * np.pi, S)
    videos = np.zeros((n, T, S, S, 3), np.float32)
    for i, c in enumerate(labels):
        pattern = np.sin((c + 1) * xs)[None, :] * np.cos((c + 1) * xs)[:, None]
        videos[i] = pattern[None, :, :, None] + 0.2 * rng.standard_normal(
            (T, S, S, 3)
        )
    return videos.astype(np.float32), labels.astype(np.int64)


@pytest.mark.slow
def test_vivim_classifier_learns():
    rng = np.random.default_rng(0)
    videos, labels = _make_videos(rng, 32, num_classes=3)
    model = ViViM(img_size=32, patch_size=8, num_frames=2, depth=2,
                  embed_dim=32, num_classes=3, drop_path_rate=0.0,
                  impl="assoc")
    trainer = RecognitionTrainer(
        model, num_classes=3, lr=2e-3, layer_decay=0.9,
        mixup_alpha=0.0, cutmix_alpha=0.0, smoothing=0.0,
        warmup_steps=5, total_steps=500,
    )
    for epoch in range(20):
        perm = rng.permutation(len(videos))
        for i in range(0, len(videos), 8):
            idx = perm[i : i + 8]
            loss = trainer.train_step(videos[idx], labels[idx])
    acc = trainer.evaluate(videos, labels)
    assert acc["top1"] > 70.0, (acc, loss)


def test_trainer_with_mixup_runs():
    rng = np.random.default_rng(1)
    videos, labels = _make_videos(rng, 8, num_classes=6)
    model = ViViM(img_size=32, patch_size=16, num_frames=2, depth=1,
                  embed_dim=16, num_classes=6, impl="assoc")
    trainer = RecognitionTrainer(model, num_classes=6, lr=1e-3,
                                 mixup_alpha=0.8, cutmix_alpha=1.0)
    loss = trainer.train_step(videos, labels)
    assert np.isfinite(loss)
    # multi-view eval path
    vids = np.repeat(np.arange(4), 2)
    acc = trainer.evaluate(videos, labels, video_ids=vids)
    assert "top1" in acc and "top5" in acc
