"""PDVC SetCriterion: matched losses for labels/boxes/count/captions.

Reference: /root/reference/video-mamba-suite/video-dense-captioning/
pdvc/criterion.py — focal label loss over all queries (matched queries get
their GT class), L1 + gIoU on matched boxes, count cross-entropy, caption
CE on matched queries. Vectorized with a static (B, max_gt) match index
from matcher.hungarian_match.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..tal.losses import sigmoid_focal_loss
from .matcher import cl_to_se, giou_1d


def pdvc_losses(
    outputs: Dict,
    gt_boxes: jax.Array,      # (B, G, 2) center/length, normalized
    gt_labels: jax.Array,     # (B, G) int
    gt_valid: jax.Array,      # (B, G) bool
    match_idx: jax.Array,     # (B, G) query index per GT, −1 invalid
    caption_logits: Optional[jax.Array] = None,  # (B, G, L, V)
    caption_targets: Optional[jax.Array] = None,  # (B, G, L) −100 pad
    count_weight: float = 0.5,
    bbox_weight: float = 5.0,
    giou_weight: float = 2.0,
    label_weight: float = 2.0,
    caption_weight: float = 1.0,
) -> Dict[str, jax.Array]:
    logits = outputs["pred_logits"]                 # (B, Q, C)
    boxes = outputs["pred_boxes"]                   # (B, Q, 2)
    B, Q, C = logits.shape
    G = gt_boxes.shape[1]
    valid = gt_valid & (match_idx >= 0)
    safe_idx = jnp.clip(match_idx, 0, Q - 1)
    num_pos = jnp.maximum(jnp.sum(valid), 1)

    # --- labels: one-hot targets at matched queries, focal loss over all
    tgt_cls = jnp.zeros((B, Q, C), jnp.float32)
    onehot = jax.nn.one_hot(gt_labels, C) * valid[..., None]
    tgt_cls = jax.vmap(
        lambda t, idx, src: t.at[idx].add(src)
    )(tgt_cls, safe_idx, onehot)
    tgt_cls = jnp.clip(tgt_cls, 0.0, 1.0)
    loss_label = jnp.sum(
        sigmoid_focal_loss(logits, tgt_cls, reduction="none")
    ) / num_pos

    # --- boxes on matched pairs
    matched_boxes = jax.vmap(lambda b, i: b[i])(boxes, safe_idx)  # (B, G, 2)
    l1 = jnp.sum(jnp.abs(matched_boxes - gt_boxes), axis=-1)
    loss_bbox = jnp.sum(l1 * valid) / num_pos
    g = jax.vmap(
        lambda p, t: jnp.diagonal(giou_1d(cl_to_se(p), cl_to_se(t)))
    )(matched_boxes, gt_boxes)
    loss_giou = jnp.sum((1.0 - g) * valid) / num_pos

    # --- event count CE (criterion.py loss_counter)
    counts = jnp.sum(gt_valid, axis=1)
    n_count = outputs["pred_count"].shape[-1]
    counts = jnp.clip(counts, 0, n_count - 1)
    logp = jax.nn.log_softmax(outputs["pred_count"].astype(jnp.float32), -1)
    loss_count = -jnp.mean(logp[jnp.arange(B), counts])

    out = dict(
        loss_label=loss_label, loss_bbox=loss_bbox, loss_giou=loss_giou,
        loss_count=loss_count,
    )

    # --- captions on matched queries
    if caption_logits is not None:
        cap_valid = (caption_targets != -100) & valid[..., None]
        safe_t = jnp.where(cap_valid, caption_targets, 0)
        logp_c = jax.nn.log_softmax(caption_logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp_c, safe_t[..., None], axis=-1)[..., 0]
        out["loss_caption"] = jnp.sum(ce * cap_valid) / jnp.maximum(
            jnp.sum(cap_valid), 1
        )
    total = (
        label_weight * out["loss_label"]
        + bbox_weight * out["loss_bbox"]
        + giou_weight * out["loss_giou"]
        + count_weight * out["loss_count"]
        + caption_weight * out.get("loss_caption", 0.0)
    )
    out["loss_total"] = total
    return out
