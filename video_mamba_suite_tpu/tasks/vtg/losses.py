"""UniVTG losses: span L1+gIoU, weighted-BCE foreground, saliency contrastive.

Reference: SetCriterion in /root/reference/video-mamba-suite/
video-temporal-grounding/model/univtg_mamba.py:388-583.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def smooth_l1(x, y, beta: float = 1.0):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def generalized_temporal_iou(spans1, spans2, eps: float = 1e-6):
    """Pairwise-diagonal gIoU of (start, end) spans, both (N, 2)."""
    s1, e1 = spans1[:, 0], spans1[:, 1]
    s2, e2 = spans2[:, 0], spans2[:, 1]
    inter = jnp.clip(jnp.minimum(e1, e2) - jnp.maximum(s1, s2), 0, None)
    union = (e1 - s1) + (e2 - s2) - inter
    iou = inter / jnp.maximum(union, eps)
    hull = jnp.maximum(e1, e2) - jnp.minimum(s1, s2)
    return iou - (hull - union) / jnp.maximum(hull, eps)


def vtg_losses(
    outputs: Dict, targets: Dict,
    eos_coef: float = 0.1, temperature: float = 0.07,
    weights: Dict[str, float] = None,
) -> Dict[str, jax.Array]:
    """All four loss terms (loss_b span L1, loss_g gIoU, loss_f foreground
    BCE, loss_s_inter/intra saliency InfoNCE), plus the weighted total.

    targets: timestamp (B, Lv, 2), timestamp_mask (B, Lv),
    timestamp_window (B, Lv), span_labels_nn (B, Lv, 2),
    saliency_pos_labels (B,) int, saliency_scores (B, Lv).
    """
    weights = weights or dict(loss_b=10.0, loss_g=1.0, loss_f=10.0,
                              loss_s_inter=0.1, loss_s_intra=0.1)
    out: Dict[str, jax.Array] = {}

    # --- spans (univtg_mamba.py:426-445)
    start_spans = targets["timestamp"].astype(jnp.float32)
    pred_spans = outputs["pred_spans"].astype(jnp.float32)
    src_spans = start_spans + pred_spans
    gt_spans = targets["span_labels_nn"].astype(jnp.float32)
    mask_valid = targets["timestamp_window"].astype(jnp.float32)
    l1 = smooth_l1(src_spans, gt_spans) * mask_valid[..., None]
    out["loss_b"] = jnp.sum(l1) / jnp.maximum(jnp.sum(mask_valid), 1.0)
    giou = generalized_temporal_iou(
        src_spans.reshape(-1, 2), gt_spans.reshape(-1, 2)
    ).reshape(mask_valid.shape)
    out["loss_g"] = jnp.sum((1.0 - giou) * mask_valid) / jnp.maximum(
        jnp.sum(mask_valid), 1.0
    )

    # --- foreground labels (:447-466): BCE on sigmoid probs with
    # per-position weights (foreground 1.0, background eos_coef)
    probs = jnp.clip(outputs["pred_logits"][..., 0].astype(jnp.float32),
                     1e-6, 1 - 1e-6)
    mask = targets["timestamp_mask"].astype(jnp.float32)
    tgt = mask_valid
    w = jnp.where(tgt > 0, 1.0, eos_coef) * mask
    bce = -(tgt * jnp.log(probs) + (1 - tgt) * jnp.log(1 - probs)) * w
    out["loss_f"] = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    # --- saliency (:468-515)
    vid_mem = outputs["vid_mem_proj"].astype(jnp.float32)      # (B, Lv, D)
    txt_feats = outputs["txt_mem_proj"][:, 0].astype(jnp.float32)  # (B, D)
    pos_idx = targets["saliency_pos_labels"].astype(jnp.int32)     # (B,)
    B = vid_mem.shape[0]
    bidx = jnp.arange(B)
    vid_feats = vid_mem[bidx, pos_idx]                          # (B, D)

    def norm(x):
        return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-8)

    sim = norm(vid_feats) @ norm(txt_feats).T                    # (B, B)
    i_logsm = jax.nn.log_softmax(sim / temperature, axis=1)
    j_logsm = jax.nn.log_softmax(sim.T / temperature, axis=1)
    out["loss_s_inter"] = -(jnp.mean(jnp.diag(i_logsm)) +
                            jnp.mean(jnp.diag(j_logsm)))

    # intra: positives vs lower-scored clips within the video
    sal = targets["saliency_scores"].astype(jnp.float32)        # (B, Lv)
    sel = sal[bidx, pos_idx][:, None]
    neg_in = (sal < sel).at[bidx, pos_idx].set(True)
    mask_inval = neg_in & (mask > 0)
    # finite additive mask (the reference's log(mask + 1e-45) flushes to
    # -inf under XLA's subnormal handling, NaN-ing softmax rows that are
    # fully masked)
    sim_in = _cos(vid_mem, txt_feats[:, None]) + jnp.where(
        mask_inval, 0.0, -1e4
    )                                                            # (B, Lv)
    logsm_i = jax.nn.log_softmax(sim_in / temperature, axis=1)
    logsm_j = jax.nn.log_softmax(sim_in.T / temperature, axis=1)
    out["loss_s_intra"] = -(jnp.mean(logsm_i[bidx, pos_idx]) +
                            jnp.mean(logsm_j[pos_idx, bidx]))

    out["loss_total"] = sum(out[k] * weights.get(k, 1.0) for k in list(out))
    return out


def _cos(a, b):
    # eps inside the sqrt: jnp.linalg.norm's gradient is NaN at zero rows
    af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
    num = jnp.sum(af * bf, axis=-1)
    den = jnp.sqrt(jnp.sum(af * af, -1) + 1e-8) * jnp.sqrt(jnp.sum(bf * bf, -1) + 1e-8)
    return num / den
