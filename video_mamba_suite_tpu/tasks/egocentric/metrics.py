"""EK100 multi-instance retrieval metrics: mAP and nDCG.

Numpy re-implementation of /root/reference/video-mamba-suite/
egocentric-understanding/avion/utils/evaluation_ek100mir.py (itself from
Wray et al.'s Joint-Part-of-Speech-Embeddings evaluation).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def calculate_k_counts(relevancy_matrix: np.ndarray) -> np.ndarray:
    """Mask of the first k (=#relevant) sorted retrievals per query
    (evaluation_ek100mir.py:53-82)."""
    return (np.sort(relevancy_matrix)[:, ::-1] > 0).astype(int)


def calculate_DCG(similarity_matrix, relevancy_matrix, k_counts) -> np.ndarray:
    """(evaluation_ek100mir.py:10-51)."""
    x_sz, y_sz = similarity_matrix.shape
    ranks = np.argsort(similarity_matrix)[:, ::-1]
    logs = np.log2(np.arange(y_sz) + 2)
    divisors = np.repeat(logs[None], x_sz, axis=0)
    columns = np.repeat(np.arange(x_sz)[:, None], y_sz, axis=1)
    numerators = relevancy_matrix[columns, ranks] * k_counts
    return np.sum(numerators / divisors, axis=1)


def calculate_IDCG(relevancy_matrix, k_counts) -> np.ndarray:
    return calculate_DCG(relevancy_matrix, relevancy_matrix, k_counts)


def calculate_nDCG(similarity_matrix, relevancy_matrix, k_counts=None,
                   IDCG=None, reduction="mean"):
    """(evaluation_ek100mir.py:103-141)."""
    if k_counts is None:
        k_counts = calculate_k_counts(relevancy_matrix)
    DCG = calculate_DCG(similarity_matrix, relevancy_matrix, k_counts)
    if IDCG is None:
        IDCG = calculate_IDCG(relevancy_matrix, k_counts)
    vals = DCG / np.maximum(IDCG, 1e-8)
    return float(np.mean(vals)) if reduction == "mean" else vals


def calculate_mAP(sim_mat: np.ndarray, relevancy_matrix: np.ndarray) -> float:
    """Mean average precision with binary relevance == 1
    (evaluation_ek100mir.py:144-179)."""
    ranked_order = (-sim_mat).argsort()
    rows = np.arange(sim_mat.shape[0])[:, None]
    ranked_rel = relevancy_matrix[rows, ranked_order]
    cumulative = np.cumsum(ranked_rel, axis=1).astype(np.float64)
    cumulative[ranked_rel != 1] = 0
    divisor = np.arange(ranked_rel.shape[1]) + 1
    n_rel = np.sum(ranked_rel == 1, axis=1)
    avg_prec = np.sum(cumulative / divisor, axis=1) / np.maximum(n_rel, 1)
    return float(np.mean(avg_prec))


def get_mAP(similarity_matrix, rel_matrix) -> Tuple[float, float, float]:
    vis = calculate_mAP(similarity_matrix, rel_matrix)
    txt = calculate_mAP(similarity_matrix.T, rel_matrix.T)
    return vis, txt, (vis + txt) / 2


def get_nDCG(similarity_matrix, rel_matrix) -> Tuple[float, float, float]:
    vk = calculate_k_counts(rel_matrix)
    tk = calculate_k_counts(rel_matrix.T)
    vi = calculate_IDCG(rel_matrix, vk)
    ti = calculate_IDCG(rel_matrix.T, tk)
    vis = calculate_nDCG(similarity_matrix, rel_matrix, vk, vi)
    txt = calculate_nDCG(similarity_matrix.T, rel_matrix.T, tk, ti)
    return vis, txt, (vis + txt) / 2


def create_relevancy_matrix(vis_classes: np.ndarray, txt_classes: np.ndarray
                            ) -> np.ndarray:
    """Binary relevancy from class agreement (the EK100 pipeline builds this
    from verb/noun annotations; tests use class labels)."""
    return (vis_classes[:, None] == txt_classes[None, :]).astype(np.float64)


# --- EK100 CLS helpers (avion/utils/evaluation_ek100cls.py) -----------------


def get_marginal_indexes(action_groups: np.ndarray, num_groups: int = None):
    """For each verb/noun id, the action ids containing it
    (evaluation_ek100cls.py:7-23).

    action_groups: (num_actions,) array giving each action's verb (or noun)
    id. Returns a list indexed by group id; empty groups map to [0] like the
    reference."""
    action_groups = np.asarray(action_groups)
    if num_groups is None:
        num_groups = int(action_groups.max()) + 1
    out = []
    for g in range(num_groups):
        vals = np.nonzero(action_groups == g)[0]
        out.append(vals if len(vals) else np.array([0]))
    return out


def marginalize(probs: np.ndarray, indexes) -> np.ndarray:
    """Sum action probabilities into verb/noun marginals
    (evaluation_ek100cls.py:26-30). probs (N, num_actions) → (N, num_groups).
    """
    return np.stack([probs[:, ilist].sum(1) for ilist in indexes], axis=1)


def get_mean_accuracy(cm: np.ndarray):
    """(per-class mean accuracy, overall accuracy) from a confusion matrix
    (evaluation_ek100cls.py:33-41)."""
    per_class = [
        cm[i, i] / cm[i, :].sum() if cm[i, :].sum() > 0 else 0.0
        for i in range(len(cm))
    ]
    return 100 * float(np.mean(per_class)), 100 * float(
        np.trace(cm) / max(np.sum(cm), 1))
