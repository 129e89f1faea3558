"""TAS batch pipeline: frame features + frame labels, padded with masks.

Capability match for /root/reference/video-mamba-suite/
temporal-action-segmentation/batch_gen.py (MS-TCN-style): .npy features
(C, L), text ground-truth files mapped through actions_dict, sample_rate
subsampling, padding to the batch max length with target = -100 (the CE
ignore index) and a frame-validity mask. Includes the time-warp augmentation
(grid_sampler.py) as a numpy resample.

TPU difference: for XLA-friendly static shapes, `pad_to` can bucket batch
lengths to a fixed multiple so jit recompiles are bounded.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IGNORE_INDEX = -100


def time_warp(features: np.ndarray, labels: np.ndarray,
              rng: np.random.Generator, num_knots: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """Smooth monotone time-warp (grid_sampler.py GridSampler/TimeWarpLayer):
    features bilinear, labels nearest."""
    L = features.shape[1]
    knots = np.sort(rng.uniform(0, 1, num_knots))
    knots = np.concatenate([[0.0], knots, [1.0]])
    vals = np.sort(rng.uniform(0, 1, num_knots))
    vals = np.concatenate([[0.0], vals, [1.0]])
    t = np.linspace(0, 1, L)
    warped_t = np.interp(t, knots, vals) * (L - 1)
    lo = np.floor(warped_t).astype(int)
    hi = np.minimum(lo + 1, L - 1)
    w = warped_t - lo
    feats = features[:, lo] * (1 - w)[None] + features[:, hi] * w[None]
    labs = labels[np.round(warped_t).astype(int)]
    return feats.astype(features.dtype), labs


class TasBatchGenerator:
    """File-backed generator (batch_gen.py semantics)."""

    def __init__(self, num_classes: int, actions_dict: Dict[str, int],
                 gt_path: str, features_path: str, sample_rate: int = 1,
                 pad_to: Optional[int] = None, seed: int = 0):
        self.num_classes = num_classes
        self.actions_dict = actions_dict
        self.gt_path = gt_path
        self.features_path = features_path
        self.sample_rate = sample_rate
        self.pad_to = pad_to
        self.index = 0
        self.list_of_examples: List[str] = []
        self.rng = np.random.default_rng(seed)

    def read_data(self, vid_list_file: str):
        with open(vid_list_file) as f:
            self.list_of_examples = [l for l in f.read().split("\n") if l]
        self.shuffle()

    def shuffle(self):
        perm = self.rng.permutation(len(self.list_of_examples))
        self.list_of_examples = [self.list_of_examples[i] for i in perm]

    def reset(self):
        self.index = 0
        self.shuffle()

    def has_next(self) -> bool:
        return self.index < len(self.list_of_examples)

    def _load_one(self, vid: str) -> Tuple[np.ndarray, np.ndarray]:
        feats = np.load(os.path.join(self.features_path, vid.split(".")[0] + ".npy"))
        with open(os.path.join(self.gt_path, vid)) as f:
            content = [l for l in f.read().split("\n") if l]
        n = min(feats.shape[1], len(content))
        classes = np.array([self.actions_dict[c] for c in content[:n]], np.int64)
        return feats[:, :n][:, :: self.sample_rate], classes[:: self.sample_rate]

    def next_batch(self, batch_size: int, if_warp: bool = False):
        batch_vids = self.list_of_examples[self.index : self.index + batch_size]
        self.index += batch_size
        items = [self._load_one(v) for v in batch_vids]
        if if_warp:
            items = [time_warp(f, l, self.rng) for f, l in items]
        return collate(items, self.pad_to) + (batch_vids,)


def collate(items: Sequence[Tuple[np.ndarray, np.ndarray]],
            pad_to: Optional[int] = None):
    """Pad (C,L) features / (L,) labels to the batch max (or a bucketed
    length). Returns (features (B,L,C), targets (B,L), mask (B,L))."""
    lengths = [len(l) for _, l in items]
    maxlen = max(lengths)
    if pad_to:
        maxlen = -(-maxlen // pad_to) * pad_to
    C = items[0][0].shape[0]
    B = len(items)
    feats = np.zeros((B, maxlen, C), np.float32)
    targets = np.full((B, maxlen), IGNORE_INDEX, np.int64)
    mask = np.zeros((B, maxlen), np.float32)
    for i, (f, l) in enumerate(items):
        n = len(l)
        feats[i, :n] = f[:, :n].T
        targets[i, :n] = l
        mask[i, :n] = 1.0
    return feats, targets, mask


def make_synthetic_dataset(
    num_videos: int = 8, num_classes: int = 5, feat_dim: int = 32,
    min_len: int = 40, max_len: int = 90, seed: int = 0,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Synthetic segmentation data with learnable structure: each class has a
    prototype feature vector + noise, labels change in runs. Used by tests
    (the reference has no task tests at all, SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((num_classes, feat_dim)) * 2.0
    items = []
    for _ in range(num_videos):
        L = int(rng.integers(min_len, max_len))
        labels = []
        while len(labels) < L:
            c = int(rng.integers(num_classes))
            labels += [c] * int(rng.integers(5, 15))
        labels = np.array(labels[:L])
        feats = protos[labels].T + 0.3 * rng.standard_normal((feat_dim, L))
        items.append((feats.astype(np.float32), labels))
    return items
