"""Mixup / CutMix / label smoothing for video classification.

Reference: /root/reference/video-mamba-suite/action-recognition/
datasets/mixup.py (timm-style Mixup with switch_prob) used by
run_class_finetuning.py. Jit-friendly: batch-level lambda, static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jax.Array, num_classes: int,
                   smoothing: float = 0.0) -> jax.Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def mixup_cutmix(
    rng: jax.Array,
    videos: jax.Array,        # (B, T, H, W, C)
    labels: jax.Array,        # (B,) int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-level mixup OR cutmix (switch_prob picks), reversed-batch pairing
    (timm Mixup semantics). Returns (mixed videos, soft targets)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    B, T, H, W, C = videos.shape
    flipped = videos[::-1]
    y1 = one_hot_smooth(labels, num_classes, smoothing)
    y2 = y1[::-1]

    lam_mix = jax.random.beta(k1, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(k2, cutmix_alpha, cutmix_alpha)
    use_cutmix = jax.random.uniform(k3) < switch_prob

    # mixup
    mixed_mixup = videos * lam_mix + flipped * (1 - lam_mix)

    # cutmix: one shared box, lambda corrected to the box area
    cut_rat = jnp.sqrt(1.0 - lam_cut)
    ch, cw = (cut_rat * H).astype(jnp.int32), (cut_rat * W).astype(jnp.int32)
    cy = jax.random.randint(k4, (), 0, H)
    cx = jax.random.randint(k4, (), 0, W)
    y0 = jnp.clip(cy - ch // 2, 0, H)
    y1b = jnp.clip(cy + ch // 2, 0, H)
    x0 = jnp.clip(cx - cw // 2, 0, W)
    x1b = jnp.clip(cx + cw // 2, 0, W)
    rows = jnp.arange(H)[None, None, :, None, None]
    cols = jnp.arange(W)[None, None, None, :, None]
    in_box = ((rows >= y0) & (rows < y1b) & (cols >= x0) & (cols < x1b))
    mixed_cutmix = jnp.where(in_box, flipped, videos)
    lam_cut_adj = 1.0 - ((y1b - y0) * (x1b - x0)) / (H * W)

    mixed = jnp.where(use_cutmix, mixed_cutmix, mixed_mixup)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    targets = y1 * lam + y2 * (1 - lam)
    return mixed, targets
