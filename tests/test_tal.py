"""TAL tests: losses, label assignment, NMS, mAP evaluator, end-to-end learn.

Task-level coverage the reference lacks (SURVEY.md §4); NMS/metrics checked
against hand-computed oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.tal import (
    ANETdetection,
    TalTrainer,
    batched_nms,
    ctr_diou_loss_1d,
    nms_1d,
    sigmoid_focal_loss,
    soft_nms_1d,
)
from video_mamba_suite_tpu.tasks.tal.data import collate_tal, make_synthetic_tal
from video_mamba_suite_tpu.tasks.tal.model import (
    ActionMambaDetector,
    PointGenerator,
    label_points,
)


def test_focal_loss_matches_bce_at_gamma0():
    logits = jnp.array([[0.5, -1.0], [2.0, 0.0]])
    targets = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    fl = sigmoid_focal_loss(logits, targets, alpha=-1, gamma=0.0)
    p = jax.nn.sigmoid(logits)
    bce = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    np.testing.assert_allclose(np.asarray(fl), np.asarray(bce), rtol=1e-5)


def test_diou_zero_for_perfect_match():
    off = jnp.array([[1.0, 2.0], [3.0, 0.5]])
    loss = ctr_diou_loss_1d(off, off)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)
    # worse overlap → larger loss
    worse = ctr_diou_loss_1d(jnp.array([[0.1, 0.1]]), jnp.array([[3.0, 3.0]]))
    assert float(worse[0]) > 0.5


def test_nms_1d_suppresses_overlaps():
    segs = np.array([[0, 10], [1, 11], [20, 30]], np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_1d(segs, scores, iou_threshold=0.5)
    assert list(keep) == [0, 2]


def test_soft_nms_decays_scores():
    segs = np.array([[0, 10], [1, 11], [20, 30]], np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    out_segs, out_scores, inds = soft_nms_1d(segs, scores, min_score=1e-4)
    assert inds[0] == 0
    # the overlapping seg survives but with decayed score
    i1 = list(inds).index(1)
    assert out_scores[i1] < 0.8
    i2 = list(inds).index(2)
    np.testing.assert_allclose(out_scores[i2], 0.7, rtol=1e-6)


def test_batched_nms_multiclass_keeps_classes_separate():
    segs = np.array([[0, 10], [1, 11]], np.float64)
    scores = np.array([0.9, 0.8])
    cls = np.array([0, 1])
    s, sc, c = batched_nms(segs, scores, cls, 0.5, 0.001, 10,
                           use_soft_nms=False, multiclass=True,
                           voting_thresh=0.0)
    assert len(s) == 2  # different classes → both kept


def test_anet_map_perfect_predictions():
    gt = {"v1": [(0.0, 1.0, 0), (2.0, 3.0, 1)], "v2": [(1.0, 2.0, 0)]}
    ev = ANETdetection(gt, tiou_thresholds=[0.5])
    preds = {
        "video-id": ["v1", "v1", "v2"],
        "t-start": np.array([0.0, 2.0, 1.0]),
        "t-end": np.array([1.0, 3.0, 2.0]),
        "score": np.array([0.9, 0.8, 0.95]),
        "label": np.array([0, 1, 0]),
    }
    mAP, avg = ev.evaluate(preds)
    np.testing.assert_allclose(avg, 1.0, atol=1e-6)
    # totally wrong predictions → 0
    bad = dict(preds)
    bad["t-start"] = np.array([5.0, 9.0, 7.0])
    bad["t-end"] = np.array([6.0, 10.0, 8.0])
    _, avg_bad = ev.evaluate(bad)
    assert avg_bad == 0.0


def test_label_points_assigns_center():
    pts_gen = PointGenerator(64, 2, 2, [(0, 8), (8, 10000)])
    points = jnp.concatenate(pts_gen([64, 32]), axis=0)
    segs = jnp.array([[[10.0, 20.0]]])
    labels = jnp.array([[1]])
    valid = jnp.array([[True]])
    cls_t, reg_t = label_points(points, segs, labels, valid, num_classes=3)
    # point t=15 on level 0 (index 15) is inside the center radius
    assert float(cls_t[0, 15, 1]) == 1.0
    assert float(cls_t[0, 15, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(reg_t[0, 15]), [5.0, 5.0], atol=1e-5)
    # a far-away point gets no label
    assert float(jnp.sum(cls_t[0, 50])) == 0.0


def test_detector_shapes():
    model = ActionMambaDetector(
        input_dim=16, num_classes=3, max_seq_len=64, embd_dim=32,
        backbone_arch=(2, 1, 2), impl="assoc", mixer="dbm",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 16))
    mask = jnp.ones((2, 64))
    params = model.init({"params": jax.random.PRNGKey(1)}, x, mask)
    cls_logits, offsets, fpn_masks = model.apply(params, x, mask)
    assert len(cls_logits) == 3
    assert cls_logits[0].shape == (2, 64, 3)
    assert cls_logits[1].shape == (2, 32, 3)
    assert offsets[2].shape == (2, 16, 2)
    assert all(bool(jnp.all(o >= 0)) for o in offsets)  # ReLU'd offsets


@pytest.mark.slow
def test_tal_end_to_end_learns():
    items = make_synthetic_tal(num_videos=6, num_classes=2, feat_dim=12,
                               seq_len=128)
    trainer = TalTrainer(
        input_dim=12, num_classes=2, max_seq_len=128, embd_dim=32,
        backbone_arch=(1, 1, 2),
        regression_range=[(0, 8), (8, 32), (32, 10000)],
        lr=2e-3, warmup_steps=5, total_steps=400, impl="assoc",
        max_num_gt=8,
    )
    for ep in range(30):
        stats = trainer.train_epoch(items, batch_size=2)
    assert np.isfinite(stats["final_loss"])
    mAP, avg = trainer.evaluate(items, tiou_thresholds=[0.3], use_ema=False)
    assert avg > 0.3, f"avg mAP {avg}, stats {stats}"
