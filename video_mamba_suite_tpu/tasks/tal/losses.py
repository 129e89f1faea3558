"""TAL losses: sigmoid focal loss + center-offset (D/G)IoU for 1-D segments.

Reference: /root/reference/video-mamba-suite/temporal-action-localization/
libs/modeling/losses.py:5-170 (fvcore-derived), fp32 math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(inputs: jax.Array, targets: jax.Array,
                       alpha: float = 0.25, gamma: float = 2.0,
                       reduction: str = "none") -> jax.Array:
    """RetinaNet focal loss (losses.py:5-52)."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(inputs)
    ce = optax_sigmoid_bce(inputs, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _iou_terms(input_offsets, target_offsets, eps):
    lp, rp = input_offsets[:, 0], input_offsets[:, 1]
    lg, rg = target_offsets[:, 0], target_offsets[:, 1]
    lkis = jnp.minimum(lp, lg)
    rkis = jnp.minimum(rp, rg)
    intsctk = rkis + lkis
    unionk = (lp + rp) + (lg + rg) - intsctk
    iouk = intsctk / jnp.maximum(unionk, eps)
    return lp, rp, lg, rg, iouk


def ctr_giou_loss_1d(input_offsets, target_offsets, reduction: str = "none",
                     eps: float = 1e-8):
    """1-D GIoU on (left, right) center offsets (losses.py:55-105); reduces to
    1 − IoU in this parameterization."""
    input_offsets = input_offsets.astype(jnp.float32)
    target_offsets = target_offsets.astype(jnp.float32)
    *_, iouk = _iou_terms(input_offsets, target_offsets, eps)
    loss = 1.0 - iouk
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def ctr_diou_loss_1d(input_offsets, target_offsets, reduction: str = "none",
                     eps: float = 1e-8):
    """1-D Distance-IoU (losses.py:108-170): 1 − IoU + (center dist / hull)²."""
    input_offsets = input_offsets.astype(jnp.float32)
    target_offsets = target_offsets.astype(jnp.float32)
    lp, rp, lg, rg, iouk = _iou_terms(input_offsets, target_offsets, eps)
    lc = jnp.maximum(lp, lg)
    rc = jnp.maximum(rp, rg)
    len_c = lc + rc
    rho = 0.5 * (rp - lp - rg + lg)
    loss = 1.0 - iouk + jnp.square(rho / jnp.maximum(len_c, eps))
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
