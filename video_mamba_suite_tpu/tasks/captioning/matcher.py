"""Hungarian matcher for PDVC.

Reference: /root/reference/video-mamba-suite/video-dense-captioning/
pdvc/matcher.py — cost = focal class cost + L1(center,length) + 1-D gIoU,
solved with scipy linear_sum_assignment. On TPU the cost matrix is computed
on device; the assignment runs on host via `jax.pure_callback` with static
shapes (Q × max_gt padded with +inf-cost columns).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def cl_to_se(boxes):
    """(center, length) → (start, end)."""
    c, l = boxes[..., 0], boxes[..., 1]
    return jnp.stack([c - 0.5 * l, c + 0.5 * l], axis=-1)


def giou_1d(a_se, b_se, eps: float = 1e-6):
    """Pairwise gIoU matrix between (N, 2) and (M, 2) start/end spans."""
    s1, e1 = a_se[:, None, 0], a_se[:, None, 1]
    s2, e2 = b_se[None, :, 0], b_se[None, :, 1]
    inter = jnp.clip(jnp.minimum(e1, e2) - jnp.maximum(s1, s2), 0, None)
    union = (e1 - s1) + (e2 - s2) - inter
    iou = inter / jnp.maximum(union, eps)
    hull = jnp.maximum(e1, e2) - jnp.minimum(s1, s2)
    return iou - (hull - union) / jnp.maximum(hull, eps)


def match_cost(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid,
               cost_class: float = 2.0, cost_bbox: float = 5.0,
               cost_giou: float = 2.0, alpha: float = 0.25,
               gamma: float = 2.0):
    """Per-sample cost matrix (Q, max_gt); invalid GTs get a huge cost.

    Focal class cost as in matcher.py: pos_cost − neg_cost at gt class.
    """
    prob = jax.nn.sigmoid(pred_logits)                     # (Q, C)
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log1p(-prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    cost_cls = pos[:, gt_labels] - neg[:, gt_labels]       # (Q, G)
    cost_l1 = jnp.sum(
        jnp.abs(pred_boxes[:, None] - gt_boxes[None]), axis=-1
    )
    cost_g = -giou_1d(cl_to_se(pred_boxes), cl_to_se(gt_boxes))
    cost = cost_class * cost_cls + cost_bbox * cost_l1 + cost_giou * cost_g
    return jnp.where(gt_valid[None, :], cost, 1e6)


def _host_lsa(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host assignment. Returns (max_gt,) query index per GT (−1 invalid)."""
    B, Q, G = cost.shape
    out = np.full((B, G), -1, np.int32)
    for b in range(B):
        g = int(n_valid[b])
        if g == 0:
            continue
        rows, cols = linear_sum_assignment(cost[b, :, :g])
        out[b, cols] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array, n_valid: jax.Array) -> jax.Array:
    """cost (B, Q, max_gt) on device → (B, max_gt) matched query index per
    GT (−1 for padding), via a host callback (jit-safe, static shapes)."""
    B, Q, G = cost.shape
    return jax.pure_callback(
        _host_lsa,
        jax.ShapeDtypeStruct((B, G), jnp.int32),
        cost, n_valid,
        vmap_method="sequential",
    )
