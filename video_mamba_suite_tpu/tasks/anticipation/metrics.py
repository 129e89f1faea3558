"""Anticipation metrics: per-frame mAP and class-mean top-k recall.

Reference: /root/reference/video-mamba-suite/action-anticipation/src/
rekognition_online_action_detection/evaluation/postprocessing.py +
utils/ek_utils.py — per-frame calibrated AP over classes (ignoring
background index 0) and the EK100 "overall recall" = class-mean top-5
recall over verb/noun/action.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _binary_ap(y_true: np.ndarray, y_score: np.ndarray) -> float:
    order = np.argsort(-y_score, kind="stable")
    y = y_true[order]
    npos = y.sum()
    if npos == 0:
        return float("nan")
    cum_tp = np.cumsum(y)
    precision = cum_tp / (np.arange(len(y)) + 1)
    return float(np.sum(precision * y) / npos)


def perframe_average_precision(scores: np.ndarray, labels: np.ndarray,
                               ignore_index: Optional[int] = 0) -> Dict:
    """scores (N, C) probabilities, labels (N,) int → per-class AP + mAP
    (background class excluded, reference postprocessing semantics)."""
    C = scores.shape[1]
    aps = {}
    for c in range(C):
        if ignore_index is not None and c == ignore_index:
            continue
        ap = _binary_ap((labels == c).astype(np.float64), scores[:, c])
        if not np.isnan(ap):
            aps[c] = ap
    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    return {"per_class_AP": aps, "mean_AP": mean_ap}


def topk_recall(scores: np.ndarray, labels: np.ndarray, k: int = 5) -> float:
    """Class-mean top-k recall (EK100 'overall recall'): for each class, the
    fraction of its instances whose label is in the top-k predictions,
    averaged over classes present in the labels."""
    topk = np.argsort(-scores, axis=1)[:, :k]
    hit = (topk == labels[:, None]).any(axis=1)
    recalls = []
    for c in np.unique(labels):
        sel = labels == c
        recalls.append(hit[sel].mean())
    return float(100 * np.mean(recalls))


def marginalize(scores_action: np.ndarray, action_to_group: np.ndarray,
                num_groups: int) -> np.ndarray:
    """Marginalize action scores to verb/noun scores via the action→verb/noun
    map (utils/ek_utils.py action_to_verb_map/action_to_noun_map)."""
    out = np.zeros((scores_action.shape[0], num_groups), scores_action.dtype)
    for a, g in enumerate(action_to_group):
        out[:, g] += scores_action[:, a]
    return out
