"""VTG completion: VLP pretraining and QFVS (query-focused summarization).

Reference parity targets: main/train_vlp.py + DatasetVLP (point/interval/
curve types, src_cls zero-shot path), main/train_qfvs.py + dataset_qfvs.py +
eval/qfvs.py (three-forward training, top-p% shot selection, semantic-IoU
max-weight matching F1).
"""

import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.vtg.qfvs import (
    QfvsTrainer,
    calculate_semantic_matching,
    collate_qfvs,
    make_synthetic_qfvs,
    semantic_iou,
)
from video_mamba_suite_tpu.tasks.vtg.vlp import (
    VlpPretrainer,
    make_synthetic_vlp,
)


def test_semantic_matching_perfect_and_disjoint():
    tags = np.zeros((6, 4))
    tags[0, 0] = tags[1, 1] = tags[2, 2] = 1
    tags[3, 3] = tags[4, 0] = tags[5, 1] = 1
    # identical summaries → P = R = F1 = 1
    p, r, f1 = calculate_semantic_matching([0, 1, 2], [0, 1, 2], tags)
    assert (p, r, f1) == (1.0, 1.0, 1.0)
    # shot 4 shares concept 0 with shot 0 (IoU 1): matching finds it
    p, r, f1 = calculate_semantic_matching([4], [0], tags)
    assert f1 == 1.0
    # fully disjoint concepts → 0
    p, r, f1 = calculate_semantic_matching([1], [3], tags)
    assert f1 == 0.0
    assert semantic_iou(tags[0], tags[4]) == 1.0


def test_qfvs_trainer_learns_and_evaluates():
    items, shots_tag = make_synthetic_qfvs(num_items=4)
    trainer = QfvsTrainer(txt_dim=12, vid_dim=12, embed_dim=16, depth=1,
                          lr=2e-3, impl="assoc")
    vid, vmask, gt, c1, c2 = collate_qfvs(items)
    first = trainer.train_step(vid, vmask, gt, c1, c2)
    for _ in range(10):
        losses = trainer.train_step(vid, vmask, gt, c1, c2)
    assert np.isfinite(losses["loss_total"])
    assert losses["loss_total"] < first["loss_total"] * 1.5

    res = trainer.evaluate(items, shots_tag)
    for k in ("P", "R", "F"):
        assert 0.0 <= res[k] <= 100.0


def test_qfvs_three_forward_gather_vs_oracle_only():
    items, _ = make_synthetic_qfvs(num_items=2, seed=1)
    vid, vmask, gt, c1, c2 = collate_qfvs(items)
    t_gather = QfvsTrainer(txt_dim=12, vid_dim=12, embed_dim=16, depth=1,
                           loss_gather=True, impl="assoc")
    t_single = QfvsTrainer(txt_dim=12, vid_dim=12, embed_dim=16, depth=1,
                           loss_gather=False, impl="assoc")
    lg = t_gather.train_step(vid, vmask, gt, c1, c2)
    ls = t_single.train_step(vid, vmask, gt, c1, c2)
    # gathered loss sums the three concept forwards (train_qfvs.py:189-193)
    assert lg["loss_total"] > ls["loss_total"]


def test_vlp_pretrainer_over_mixed_types():
    samples = make_synthetic_vlp(num_samples=6, ctx_l=16, vid_dim=10,
                                 txt_dim=10, q_l=3)
    types = {s["type"] for s in samples}
    assert types == {"point", "interval", "curve"}
    # per-type ablation vectors recorded (dataset.py:240-247)
    for s in samples:
        assert s["weight_ablation"].shape == (5,)

    trainer = VlpPretrainer(txt_dim=10, vid_dim=10, embed_dim=16, depth=1,
                            max_q_l=3, max_v_l=16, impl="assoc",
                            input_dropout=0.0)
    stats = trainer.train_epoch(samples, batch_size=3)
    assert np.isfinite(stats["loss_total"])


def test_vlp_zero_shot_class_scores():
    samples = make_synthetic_vlp(num_samples=2, ctx_l=16, vid_dim=10,
                                 txt_dim=10, q_l=3)
    trainer = VlpPretrainer(txt_dim=10, vid_dim=10, embed_dim=16, depth=1,
                            max_q_l=3, max_v_l=16, impl="assoc",
                            input_dropout=0.0)
    trainer.train_epoch(samples, batch_size=2)
    cls_feats = np.random.default_rng(0).standard_normal(
        (5, 3, 10)).astype(np.float32)
    scores = trainer.zero_shot_class_scores(samples, cls_feats)
    assert scores.shape == (2, 16, 5)
    assert np.all(np.isfinite(scores))
    assert np.all(scores <= 1.0 + 1e-5) and np.all(scores >= -1.0 - 1e-5)
