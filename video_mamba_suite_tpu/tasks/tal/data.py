"""TAL data pipeline: pre-extracted features + segment annotations.

Capability match for /root/reference/video-mamba-suite/temporal-action-localization/
libs/datasets/ (THUMOS/ActivityNet/HACS/FineAction json + per-video feature
files, feat_stride/num_frames grid conversion, random truncation augmentation
with trunc_thresh, SURVEY.md §2.3). Feature files: .npy (C, T); the
reference's .pt torch files are also readable when torch is present.

TPU difference: batches are padded to `max_seq_len` (training) or bucketed to
`max_div_factor` multiples (eval) as in meta_archs.py:404-443, and GT segments
are padded to a static `max_num_gt` with a validity mask for the vectorized
label assignment.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def truncate_feats(
    feats: np.ndarray,        # (C, T)
    segments: np.ndarray,     # (N, 2) in feature-grid units
    labels: np.ndarray,       # (N,)
    max_seq_len: int,
    trunc_thresh: float,
    rng: np.random.Generator,
    crop_ratio: Optional[Sequence[float]] = None,
    max_num_trials: int = 200,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random window crop keeping actions with ≥ trunc_thresh overlap
    (reference libs/datasets/data_utils.py truncate_feats semantics)."""
    T = feats.shape[1]
    max_len = max_seq_len
    if T <= max_len:
        if crop_ratio is None:
            return feats, segments, labels
        max_len = int(round(T * rng.uniform(*crop_ratio)))
        max_len = min(max_len, T)
        if max_len == T:
            return feats, segments, labels
    for _ in range(max_num_trials):
        st = int(rng.integers(0, T - max_len + 1))
        ed = st + max_len
        window = np.array([st, ed], np.float64)
        if len(segments) == 0:
            return feats[:, st:ed], segments, labels
        left = np.maximum(segments[:, 0], window[0])
        right = np.minimum(segments[:, 1], window[1])
        inter = np.clip(right - left, 0, None)
        lens = segments[:, 1] - segments[:, 0]
        ratio = inter / np.maximum(lens, 1e-8)
        seg_idx = ratio > trunc_thresh
        if seg_idx.any():
            new_segs = np.stack(
                [np.clip(segments[seg_idx, 0] - st, 0, max_len),
                 np.clip(segments[seg_idx, 1] - st, 0, max_len)], axis=1
            )
            return feats[:, st:ed], new_segs, labels[seg_idx]
    # fallback: first window, keep overlapping
    st, ed = 0, max_len
    keep = (segments[:, 1] > st) & (segments[:, 0] < ed)
    new_segs = np.stack(
        [np.clip(segments[keep, 0] - st, 0, max_len),
         np.clip(segments[keep, 1] - st, 0, max_len)], axis=1
    )
    return feats[:, st:ed], new_segs, labels[keep]


class TalDataset:
    """json-annotation + feature-folder dataset (libs/datasets/thumos14.py
    style). Annotation schema: {"database": {vid: {"subset", "duration",
    "fps", "annotations": [{"segment": [s, e] (sec), "label_id": int}]}}}."""

    def __init__(self, json_file: str, feat_folder: str, split: Sequence[str],
                 feat_stride: int = 4, num_frames: int = 16,
                 default_fps: Optional[float] = None, file_ext: str = ".npy",
                 max_seq_len: int = 2304, trunc_thresh: float = 0.5,
                 crop_ratio: Optional[Sequence[float]] = (0.9, 1.0),
                 is_training: bool = True, seed: int = 0):
        self.feat_folder = feat_folder
        self.feat_stride = feat_stride
        self.num_frames = num_frames
        self.file_ext = file_ext
        self.max_seq_len = max_seq_len
        self.trunc_thresh = trunc_thresh
        self.crop_ratio = crop_ratio
        self.is_training = is_training
        self.rng = np.random.default_rng(seed)
        with open(json_file) as f:
            db = json.load(f)["database"]
        self.items = []
        for vid, v in db.items():
            if v.get("subset") not in split:
                continue
            fps = v.get("fps", default_fps)
            self.items.append(dict(
                video_id=vid, fps=fps, duration=v["duration"],
                annotations=v.get("annotations", []),
            ))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        it = self.items[idx]
        path = os.path.join(self.feat_folder, it["video_id"] + self.file_ext)
        if self.file_ext == ".npy":
            feats = np.load(path).astype(np.float32)
        else:  # .pt
            import torch

            feats = torch.load(path, map_location="cpu").numpy().astype(np.float32)
        if feats.shape[0] > feats.shape[1]:
            feats = feats.T  # ensure (C, T)
        fps = it["fps"]
        # seconds → feature grid (thumos14.py: (t * fps - 0.5 * nframes) / stride)
        segs, labels = [], []
        for a in it["annotations"]:
            s, e = a["segment"]
            segs.append([
                (s * fps - 0.5 * self.num_frames) / self.feat_stride,
                (e * fps - 0.5 * self.num_frames) / self.feat_stride,
            ])
            labels.append(a["label_id"])
        segments = np.asarray(segs, np.float64).reshape(-1, 2)
        labels = np.asarray(labels, np.int64)
        if self.is_training:
            feats, segments, labels = truncate_feats(
                feats, segments, labels, self.max_seq_len, self.trunc_thresh,
                self.rng, self.crop_ratio,
            )
        return dict(
            feats=feats, segments=segments, labels=labels,
            video_id=it["video_id"], fps=fps, duration=it["duration"],
            feat_stride=self.feat_stride, feat_num_frames=self.num_frames,
        )


def collate_tal(items: List[Dict], max_seq_len: int, max_num_gt: int,
                training: bool = True, max_div_factor: int = 32):
    """Pad features to a static length + GT to max_num_gt with validity
    (meta_archs.py preprocessing :404-443, vectorized-assignment ready)."""
    B = len(items)
    C = items[0]["feats"].shape[0]
    lens = [it["feats"].shape[1] for it in items]
    if training:
        assert max(lens) <= max_seq_len
        T = max_seq_len
    else:
        T = max(max(lens), max_seq_len)
        T = -(-T // max_div_factor) * max_div_factor
    feats = np.zeros((B, T, C), np.float32)
    mask = np.zeros((B, T), np.float32)
    segs = np.zeros((B, max_num_gt, 2), np.float32)
    labels = np.zeros((B, max_num_gt), np.int32)
    valid = np.zeros((B, max_num_gt), bool)
    for i, it in enumerate(items):
        t = it["feats"].shape[1]
        feats[i, :t] = it["feats"].T
        mask[i, :t] = 1.0
        n = min(len(it["segments"]), max_num_gt)
        if n:
            segs[i, :n] = it["segments"][:n]
            labels[i, :n] = it["labels"][:n]
            valid[i, :n] = True
    return feats, mask, segs, labels, valid


def make_synthetic_tal(
    num_videos: int = 6, num_classes: int = 3, feat_dim: int = 16,
    seq_len: int = 192, seed: int = 0,
) -> List[Dict]:
    """Synthetic localization data: class-prototype bumps on a noise floor."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((num_classes, feat_dim)) * 2.5
    items = []
    for v in range(num_videos):
        feats = 0.3 * rng.standard_normal((feat_dim, seq_len)).astype(np.float32)
        n_act = int(rng.integers(1, 4))
        segs, labels = [], []
        for _ in range(n_act):
            c = int(rng.integers(num_classes))
            start = int(rng.integers(0, seq_len - 30))
            length = int(rng.integers(12, 30))
            end = min(start + length, seq_len)
            feats[:, start:end] += protos[c][:, None]
            segs.append([start, end])
            labels.append(c)
        items.append(dict(
            feats=feats, segments=np.asarray(segs, np.float64),
            labels=np.asarray(labels, np.int64), video_id=f"v{v}",
            fps=30.0, duration=seq_len / 30.0, feat_stride=1,
            feat_num_frames=1,
        ))
    return items
