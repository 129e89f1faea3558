"""End-to-end TAS: model shapes, loss, metrics, and learning on synthetic data.

The reference has no task-level tests (SURVEY.md §4); this is the task smoke
suite it lacks — proves modules + trainer + metrics compose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.tas import (
    MaTransformer,
    TasTrainer,
    tas_loss,
)
from video_mamba_suite_tpu.tasks.tas.data import (
    IGNORE_INDEX,
    collate,
    make_synthetic_dataset,
    time_warp,
)
from video_mamba_suite_tpu.tasks.tas.metrics import (
    edit_score,
    evaluate_segmentation,
    f_score,
    get_labels_start_end_time,
)


def test_model_shapes():
    model = MaTransformer(
        num_decoders=2, num_layers=3, num_f_maps=16, input_dim=24,
        num_classes=5, impl="assoc",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 24))
    mask = jnp.ones((2, 50))
    params = model.init({"params": jax.random.PRNGKey(1)}, x, mask)
    out = model.apply(params, x, mask, deterministic=True)
    assert out.shape == (3, 2, 50, 5)  # encoder + 2 decoders
    assert bool(jnp.all(jnp.isfinite(out)))


def test_masking_invariance():
    """Outputs at valid positions must not depend on padded content."""
    model = MaTransformer(
        num_decoders=1, num_layers=2, num_f_maps=16, input_dim=8,
        num_classes=4, channel_masking_rate=0.0, impl="assoc",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 40, 8))
    mask = jnp.concatenate([jnp.ones((1, 30)), jnp.zeros((1, 10))], axis=1)
    params = model.init({"params": jax.random.PRNGKey(1)}, x, mask)
    out1 = model.apply(params, x, mask, deterministic=True)
    x2 = x.at[:, 30:].set(99.0)  # corrupt padding
    out2 = model.apply(params, x2, mask, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, :30]), np.asarray(out2[:, :, :30]),
        rtol=1e-4, atol=1e-4,
    )


def test_loss_ignores_padding():
    S, B, L, C = 2, 1, 10, 4
    logits = jax.random.normal(jax.random.PRNGKey(0), (S, B, L, C))
    targets = jnp.zeros((B, L), jnp.int32)
    targets = targets.at[:, 5:].set(IGNORE_INDEX)
    mask = jnp.concatenate([jnp.ones((B, 5)), jnp.zeros((B, 5))], axis=1)
    l1 = tas_loss(logits, targets, mask)
    # corrupt ignored logits — loss must not change
    logits2 = logits.at[:, :, 5:].set(123.0)
    l2 = tas_loss(logits2, targets, mask)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_metrics_reference_semantics():
    gt = [0, 0, 0, 1, 1, 2, 2, 2, 2]
    perfect = list(gt)
    assert get_labels_start_end_time(gt, bg_class=[-1])[0] == [0, 1, 2]
    assert edit_score(perfect, gt, bg_class=[-1]) == 100.0
    tp, fp, fn = f_score(perfect, gt, 0.5, bg_class=[-1])
    assert (tp, fp, fn) == (3.0, 0.0, 0.0)
    res = evaluate_segmentation([perfect], [gt])
    assert res["acc"] == 100.0 and res["F1@50"] == 100.0

    shifted = [0, 0, 1, 1, 1, 2, 2, 2, 2]
    res2 = evaluate_segmentation([shifted], [gt])
    assert res2["acc"] < 100.0
    assert res2["edit"] == 100.0  # same segment sequence


def test_time_warp_preserves_label_set():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((6, 50)).astype(np.float32)
    l = np.repeat(np.arange(5), 10)
    wf, wl = time_warp(f, l, rng)
    assert wf.shape == f.shape and wl.shape == l.shape
    assert set(np.unique(wl)) <= set(np.unique(l))


@pytest.mark.slow
def test_trainer_learns_synthetic():
    """A tiny MaTransformer should fit easy synthetic data quickly."""
    data = make_synthetic_dataset(num_videos=6, num_classes=4, feat_dim=16)
    trainer = TasTrainer(
        num_classes=4, input_dim=16, num_layers=2, num_f_maps=16,
        num_decoders=1, channel_masking_rate=0.0, lr=2e-3, impl="assoc",
    )

    class Gen:
        def __init__(self, items):
            self.items = items
            self.i = 0

        def has_next(self):
            return self.i < len(self.items)

        def next_batch(self, bs, if_warp=False):
            chunk = self.items[self.i : self.i + bs]
            self.i += bs
            return collate(chunk, pad_to=16) + (["v"] * len(chunk),)

        def reset(self):
            self.i = 0

    gen = Gen(data)
    first = trainer.train_epoch(gen, batch_size=2)
    for _ in range(14):
        stats = trainer.train_epoch(gen, batch_size=2)
    assert stats["loss"] < first["loss"]
    assert stats["acc"] > 0.7, stats
    res = trainer.evaluate(data)
    assert res["acc"] > 70.0, res
