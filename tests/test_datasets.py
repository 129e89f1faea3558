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
    # no decode backend in this image → decoding raises cleanly
    with pytest.raises(RuntimeError):
        ds[0]
