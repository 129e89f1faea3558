"""Anticipation data: per-session feature files → memory windows.

Reference: /root/reference/video-mamba-suite/action-anticipation/src/
rekognition_online_action_detection/datasets/ (TeSTra per-frame datasets):
each session has visual ({session}.npy, (T, Dv)), motion/flow ((T, Dm)) and
per-frame target ((T,) int or (T, C) one-hot/soft) files; training samples
windows of long_memory+work_memory frames, targets cover the work memory
plus anticipation positions.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


class PerFrameDataset:
    """File-backed window sampler (perframe dataset semantics)."""

    def __init__(self, sessions: Sequence[str], visual_dir: str,
                 motion_dir: Optional[str], target_dir: str,
                 long_memory: int = 8, work_memory: int = 6,
                 anticipation: int = 2, stride: int = 1, seed: int = 0):
        self.visual_dir = visual_dir
        self.motion_dir = motion_dir
        self.target_dir = target_dir
        self.long_memory = long_memory
        self.work_memory = work_memory
        self.anticipation = anticipation
        self.rng = np.random.default_rng(seed)
        self.windows: List[Tuple[str, int]] = []
        self._cache = {}
        span = long_memory + work_memory + anticipation
        for s in sessions:
            T = self._load(s)[0].shape[0]
            for start in range(0, max(T - span + 1, 0), stride):
                self.windows.append((s, start))

    def _load(self, session: str):
        if session not in self._cache:
            vis = np.load(os.path.join(self.visual_dir, session + ".npy"))
            mot = (np.load(os.path.join(self.motion_dir, session + ".npy"))
                   if self.motion_dir else
                   np.zeros((vis.shape[0], 1), np.float32))
            tgt = np.load(os.path.join(self.target_dir, session + ".npy"))
            if tgt.ndim == 2:  # one-hot / soft targets → class ids
                tgt = tgt.argmax(-1)
            self._cache[session] = (vis.astype(np.float32),
                                    mot.astype(np.float32),
                                    tgt.astype(np.int32))
        return self._cache[session]

    def __len__(self):
        return len(self.windows)

    def __getitem__(self, idx: int):
        session, start = self.windows[idx]
        vis, mot, tgt = self._load(session)
        lm, wm, ant = self.long_memory, self.work_memory, self.anticipation
        sl = slice(start, start + lm + wm)
        # targets: the work-memory frames + the anticipation horizon
        t_sl = slice(start + lm, start + lm + wm + ant)
        return (vis[sl], mot[sl], tgt[t_sl])

    def batches(self, batch_size: int, shuffle: bool = True):
        order = (self.rng.permutation(len(self))
                 if shuffle else np.arange(len(self)))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            rows = [self[j] for j in order[i : i + batch_size]]
            yield (np.stack([r[0] for r in rows]),
                   np.stack([r[1] for r in rows]),
                   np.stack([r[2] for r in rows]))
