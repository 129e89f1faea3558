"""Real-data dataset classes driven on fabricated on-disk data."""

import json
import os

import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.vtg.dataset import VtgDataset


def test_vtg_dataset_loads_fabricated_data(tmp_path):
    # fabricate jsonl + feature dirs in the QVHighlights layout
    vdir = tmp_path / "vid_feats"
    qdir = tmp_path / "txt_feats"
    vdir.mkdir()
    qdir.mkdir()
    rng = np.random.default_rng(0)
    np.save(vdir / "videoA.npy", rng.standard_normal((20, 6)).astype(np.float32))
    np.save(qdir / "qid7.npy", rng.standard_normal((4, 8)).astype(np.float32))
    meta = dict(qid=7, query="a man cooks", duration=40.0, vid="videoA",
                relevant_windows=[[10.0, 20.0]])
    jsonl = tmp_path / "train.jsonl"
    jsonl.write_text(json.dumps(meta) + "\n")

    ds = VtgDataset(str(jsonl), [str(vdir)], str(qdir), max_q_l=8, max_v_l=32,
                    clip_len=2.0, use_tef=True)
    assert len(ds) == 1
    s = ds[0]
    assert s["vid_feat"].shape == (20, 8)  # 6 feats + 2 tef
    assert s["txt_feat"].shape == (4, 8)
    t = s["targets"]
    assert t["timestamp"].shape == (20, 2)
    assert t["timestamp_window"].sum() >= 1
    # window [10, 20] s over 20 clips × 2 s: normalized [0.25, 0.5]
    pos = np.nonzero(t["timestamp_window"])[0]
    np.testing.assert_allclose(t["span_labels_nn"][pos[0]], [0.25, 0.5],
                               atol=1e-6)


def test_video_classification_dataset_csv(tmp_path):
    from video_mamba_suite_tpu.data.video_datasets import (
        VideoClassificationDataset,
    )

    csvf = tmp_path / "train.csv"
    csvf.write_text("a.mp4 3\nb.mp4 7\n")
    ds = VideoClassificationDataset(str(csvf), video_root=str(tmp_path))
    assert len(ds) == 2
    assert ds.items[1] == (str(tmp_path / "b.mp4"), 7)
    # nonexistent files → clean error after retries
    with pytest.raises(RuntimeError):
        ds[0]


def test_video_classification_real_decode(tmp_path):
    """End-to-end: encode real clips with OpenCV, sparse-sample, decode."""
    cv2 = pytest.importorskip("cv2")
    from video_mamba_suite_tpu.data.video import synthetic_video
    from video_mamba_suite_tpu.data.video_datasets import (
        VideoClassificationDataset,
    )

    for name, seed in (("a.avi", 0), ("b.avi", 1)):
        vid = synthetic_video(num_frames=12, size=32, seed=seed)
        w = cv2.VideoWriter(str(tmp_path / name),
                            cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 32))
        for f in vid:
            w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        w.release()
    csvf = tmp_path / "train.csv"
    csvf.write_text("a.avi 0\nb.avi 1\n")
    ds = VideoClassificationDataset(str(csvf), video_root=str(tmp_path),
                                    num_frames=4, num_clips=2,
                                    is_training=False)
    s = ds[0]
    assert s["frames"].shape == (2, 4, 32, 32, 3)  # 2 views × 4 frames
    assert s["frames"].dtype == np.uint8
    assert s["label"] == 0


def test_tas_batch_generator_files(tmp_path):
    """File-backed TAS generator (batch_gen.py semantics) on fabricated data."""
    from video_mamba_suite_tpu.tasks.tas.data import TasBatchGenerator

    rng = np.random.default_rng(0)
    feats_dir = tmp_path / "features"
    gt_dir = tmp_path / "groundTruth"
    feats_dir.mkdir()
    gt_dir.mkdir()
    actions = {"pour": 0, "stir": 1, "crack": 2}
    vids = []
    for i in range(3):
        L = 20 + 4 * i
        np.save(feats_dir / f"vid{i}.npy",
                rng.standard_normal((8, L)).astype(np.float32))
        labels = rng.choice(list(actions), L)
        (gt_dir / f"vid{i}.txt").write_text("\n".join(labels) + "\n")
        vids.append(f"vid{i}.txt")
    (tmp_path / "train.bundle").write_text("\n".join(vids) + "\n")

    gen = TasBatchGenerator(
        num_classes=3, actions_dict=actions, gt_path=str(gt_dir),
        features_path=str(feats_dir), sample_rate=2,
    )
    gen.read_data(str(tmp_path / "train.bundle"))
    assert gen.has_next()
    feats, targets, mask, names = gen.next_batch(2)
    assert feats.shape[0] == 2 and feats.shape[2] == 8
    assert (targets[mask > 0] >= 0).all() and (targets[mask > 0] < 3).all()
    assert (targets[mask == 0] == -100).all()
    # sample_rate halves the lengths
    assert mask[0].sum() in (10, 11, 12, 13, 14)
    gen.next_batch(2)
    assert not gen.has_next()
    gen.reset()
    assert gen.has_next()
