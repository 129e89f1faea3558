"""1-D segment NMS: hard + soft (linear/gaussian), multiclass, seg voting.

Host-side numpy re-implementation of the reference C++ op
(/root/reference/video-mamba-suite/temporal-action-localization/libs/utils/
csrc/nms_cpu.cpp:19-182) and its Python wrapper (libs/utils/nms.py:8-165).
NMS runs once per video at eval time on ~2000 segments — a host-side
scoring-path op, not a device kernel (SURVEY.md §2.1 N5 TPU mapping).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _iou_1d(seg: np.ndarray, segs: np.ndarray) -> np.ndarray:
    left = np.maximum(seg[0], segs[:, 0])
    right = np.minimum(seg[1], segs[:, 1])
    inter = np.clip(right - left, 0, None)
    union = (seg[1] - seg[0]) + (segs[:, 1] - segs[:, 0]) - inter
    return inter / np.maximum(union, 1e-8)


def nms_1d(segs: np.ndarray, scores: np.ndarray,
           iou_threshold: float) -> np.ndarray:
    """Hard NMS; returns kept indices sorted by descending score
    (nms_cpu.cpp `nms_1d_cpu`). Uses the native C++ op (csrc/nms_1d.cc)
    when available, else the numpy path below."""
    from ...ops.native import nms_1d_native

    native = nms_1d_native(np.asarray(segs), np.asarray(scores), iou_threshold)
    if native is not None:
        return native
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(segs), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive[i] = False
        rest = order[alive[order]]
        if rest.size:
            ious = _iou_1d(segs[i], segs[rest])
            alive[rest[ious > iou_threshold]] = False
    return np.array(keep, np.int64)


def soft_nms_1d(segs: np.ndarray, scores: np.ndarray,
                iou_threshold: float = 0.1, sigma: float = 0.5,
                min_score: float = 0.001, method: int = 2
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Soft NMS (nms_cpu.cpp softnms): iteratively pick the max, decay
    overlapping scores — linear (method 1) or gaussian (method 2).
    Returns (sorted_segs, sorted_scores, kept_indices). Prefers the native
    C++ op (csrc/nms_1d.cc)."""
    from ...ops.native import soft_nms_1d_native

    native = soft_nms_1d_native(
        np.asarray(segs), np.asarray(scores), iou_threshold, sigma,
        min_score, method,
    )
    if native is not None:
        return native
    segs = segs.copy().astype(np.float64)
    scores = scores.copy().astype(np.float64)
    idxs = np.arange(len(segs))
    out_segs, out_scores, out_inds = [], [], []
    n = len(segs)
    alive = np.ones(n, bool)
    for _ in range(n):
        live = np.where(alive)[0]
        if live.size == 0:
            break
        i = live[np.argmax(scores[live])]
        if scores[i] < min_score:
            break
        out_segs.append(segs[i].copy())
        out_scores.append(scores[i])
        out_inds.append(idxs[i])
        alive[i] = False
        rest = np.where(alive)[0]
        if rest.size == 0:
            break
        ious = _iou_1d(segs[i], segs[rest])
        if method == 1:      # linear
            w = np.where(ious > iou_threshold, 1.0 - ious, 1.0)
        elif method == 2:    # gaussian
            w = np.exp(-(ious * ious) / sigma)
        else:                # hard
            w = np.where(ious > iou_threshold, 0.0, 1.0)
        scores[rest] *= w
        alive[rest[scores[rest] < min_score]] = False
    return (
        np.array(out_segs).reshape(-1, 2),
        np.array(out_scores),
        np.array(out_inds, np.int64),
    )


def seg_voting(nms_segs: np.ndarray, all_segs: np.ndarray,
               all_scores: np.ndarray, iou_threshold: float,
               score_offset: float = 1.5) -> np.ndarray:
    """Bounding-segment voting (nms.py:67-100): refine kept segments by the
    score-weighted mean of overlapping candidates."""
    if len(nms_segs) == 0:
        return nms_segs
    offset_scores = all_scores + score_offset
    left = np.maximum(nms_segs[:, None, 0], all_segs[None, :, 0])
    right = np.minimum(nms_segs[:, None, 1], all_segs[None, :, 1])
    inter = np.clip(right - left, 0, None)
    nms_lens = nms_segs[:, 1] - nms_segs[:, 0]
    all_lens = all_segs[:, 1] - all_segs[:, 0]
    iou = inter / np.maximum(nms_lens[:, None] + all_lens[None, :] - inter, 1e-8)
    weights = (iou >= iou_threshold).astype(np.float64) * offset_scores[None, :]
    weights /= np.maximum(weights.sum(axis=1, keepdims=True), 1e-8)
    return weights @ all_segs


def batched_nms(
    segs: np.ndarray,
    scores: np.ndarray,
    cls_idxs: np.ndarray,
    iou_threshold: float,
    min_score: float,
    max_seg_num: int,
    use_soft_nms: bool = True,
    multiclass: bool = True,
    sigma: float = 0.5,
    voting_thresh: float = 0.75,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Detectron2-style class-aware NMS + optional voting (nms.py:103-165)."""
    segs = np.asarray(segs, np.float64)
    scores = np.asarray(scores, np.float64)
    cls_idxs = np.asarray(cls_idxs)
    if segs.shape[0] == 0:
        return np.zeros((0, 2)), np.zeros((0,)), np.zeros((0,), cls_idxs.dtype)

    def one_class(s, sc, ci):
        if use_soft_nms:
            new_segs, new_scores, inds = soft_nms_1d(
                s, sc, iou_threshold, sigma, min_score, method=2
            )
            new_cls = ci[inds]
        else:
            valid = sc > min_score
            s2, sc2, ci2 = s[valid], sc[valid], ci[valid]
            inds = nms_1d(s2, sc2, iou_threshold)
            new_segs, new_scores, new_cls = s2[inds], sc2[inds], ci2[inds]
        if max_seg_num > 0:
            new_segs = new_segs[:max_seg_num]
            new_scores = new_scores[:max_seg_num]
            new_cls = new_cls[:max_seg_num]
        if voting_thresh > 0 and len(new_segs):
            new_segs = seg_voting(new_segs, s, sc, voting_thresh)
        return new_segs, new_scores, new_cls

    if multiclass:
        parts = [one_class(segs[cls_idxs == c], scores[cls_idxs == c],
                           cls_idxs[cls_idxs == c])
                 for c in np.unique(cls_idxs)]
        new_segs = np.concatenate([p[0] for p in parts], axis=0)
        new_scores = np.concatenate([p[1] for p in parts], axis=0)
        new_cls = np.concatenate([p[2] for p in parts], axis=0)
    else:
        new_segs, new_scores, new_cls = one_class(segs, scores, cls_idxs)

    order = np.argsort(-new_scores, kind="stable")[:max_seg_num if max_seg_num > 0 else None]
    return new_segs[order], new_scores[order], new_cls[order]
