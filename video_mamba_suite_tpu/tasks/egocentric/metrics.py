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
