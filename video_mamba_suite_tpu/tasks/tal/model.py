"""ActionMamba detector: Mamba pyramid backbone + FPN + point heads.

Reference: /root/reference/video-mamba-suite/temporal-action-localization/
libs/modeling/:
  MambaBackbone  backbones.py:241-327 — 2 masked convs → 2 stem
                 MaskMambaBlocks → 5 stride-2 blocks ⇒ 6-level pyramid
  FPN1D/FPNIdentity  necks.py:11-130
  PointGenerator     loc_generators.py:28-87 — per-level (t, range_lo,
                     range_hi, stride) points
  Cls/Reg heads      meta_archs.py:14-163 — 3-layer masked convs, prior-prob
                     bias init, per-level learnable Scale + ReLU on offsets
  PtTransformer      meta_archs.py:167-786 — center-sampling label
                     assignment, focal+DIoU loss with EMA'd normalizer,
                     per-level decode

TPU design: label assignment is vectorized over (batch, points, gts) with
validity masks (static shapes) instead of the reference's per-video Python
loops; decode uses static-k `lax.top_k`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...models.common import LayerNorm1D, MaskMambaBlock, MaskedConv1D
from .losses import ctr_diou_loss_1d, sigmoid_focal_loss


class MambaBackbone(nn.Module):
    """(#embd convs, #stem blocks, #branch blocks) pyramid (backbones.py:241)."""

    n_embd: int = 512
    n_embd_ks: int = 3
    arch: Tuple[int, int, int] = (2, 2, 5)
    scale_factor: int = 2
    with_ln: bool = False
    mixer: str = "dbm"       # ActionMamba uses the DBM mixer (SURVEY.md §2.3)
    drop_path_rate: float = 0.3
    remat: bool = False      # rematerialize blocks (activation checkpointing)
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        block_cls = nn.remat(MaskMambaBlock, static_argnums=(3,))             if self.remat else MaskMambaBlock
        x = x * mask.astype(x.dtype)[..., None]
        for idx in range(self.arch[0]):
            x, mask = MaskedConv1D(
                self.n_embd, self.n_embd_ks, use_bias=not self.with_ln,
                name=f"embd{idx}",
            )(x, mask)
            if self.with_ln:
                x = LayerNorm1D(self.n_embd, name=f"embd_ln{idx}")(x)
            x = nn.relu(x)
        for idx in range(self.arch[1]):
            x, mask = block_cls(
                self.n_embd, mixer=self.mixer,
                drop_path_rate=self.drop_path_rate, impl=self.impl,
                name=f"stem{idx}",
            )(x, mask, deterministic)
        feats, masks = [x], [mask]
        for idx in range(self.arch[2]):
            x, mask = block_cls(
                self.n_embd, mixer=self.mixer, n_ds_stride=self.scale_factor,
                drop_path_rate=self.drop_path_rate, impl=self.impl,
                name=f"branch{idx}",
            )(x, mask, deterministic)
            feats.append(x)
            masks.append(mask)
        return feats, masks


class FPNIdentity(nn.Module):
    """Per-level LayerNorm only (necks.py:95-130)."""

    out_channel: int
    with_ln: bool = True

    @nn.compact
    def __call__(self, feats, masks):
        outs = []
        for i, (f, m) in enumerate(zip(feats, masks)):
            if self.with_ln:
                f = LayerNorm1D(self.out_channel, name=f"norm{i}")(f)
            outs.append(f * m.astype(f.dtype)[..., None])
        return outs, masks


class FPN1D(nn.Module):
    """Top-down FPN with lateral 1×1 + depthwise 3 convs (necks.py:11-93)."""

    out_channel: int
    with_ln: bool = True

    @nn.compact
    def __call__(self, feats, masks):
        laterals = []
        for i, (f, m) in enumerate(zip(feats, masks)):
            x, _ = MaskedConv1D(
                self.out_channel, 1, use_bias=not self.with_ln,
                name=f"lateral{i}",
            )(f, m)
            laterals.append(x)
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(laterals[i], 2, axis=1)  # nearest ×2
            laterals[i - 1] = laterals[i - 1] + up[:, : laterals[i - 1].shape[1]]
        outs = []
        for i, (x, m) in enumerate(zip(laterals, masks)):
            x, _ = MaskedConv1D(
                self.out_channel, 3, use_bias=not self.with_ln,
                name=f"fpn_conv{i}",
            )(x, m)
            if self.with_ln:
                x = LayerNorm1D(self.out_channel, name=f"fpn_norm{i}")(x)
            outs.append(x)
        return outs, masks


class PointGenerator:
    """Per-level (t, range_lo, range_hi, stride) tables (loc_generators.py:28).
    Pure numpy — points are static given the level lengths."""

    def __init__(self, max_seq_len: int, fpn_levels: int, scale_factor: int,
                 regression_range: Sequence[Sequence[float]]):
        assert len(regression_range) == fpn_levels
        self.points = []
        for l in range(fpn_levels):
            stride = scale_factor ** l
            ts = np.arange(0, max_seq_len, stride, dtype=np.float32)
            rr = np.tile(np.asarray(regression_range[l], np.float32), (len(ts), 1))
            ss = np.full((len(ts), 1), stride, np.float32)
            self.points.append(np.concatenate([ts[:, None], rr, ss], axis=1))

    def __call__(self, level_lengths: Sequence[int]) -> List[jnp.ndarray]:
        out = []
        for L, pts in zip(level_lengths, self.points):
            assert L <= pts.shape[0], "point buffer too small"
            out.append(jnp.asarray(pts[:L]))
        return out


class ConvHead(nn.Module):
    """Shared 3-layer masked-conv head (meta_archs.py:14-163)."""

    feat_dim: int
    out_dim: int
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = False
    prior_prob: float = 0.0   # >0 ⇒ classification bias init
    empty_cls: Sequence[int] = ()

    @nn.compact
    def __call__(self, feats, masks):
        def final_bias_init(key, shape, dtype=jnp.float32):
            if self.prior_prob > 0:
                b = -math.log((1 - self.prior_prob) / self.prior_prob)
                bias = jnp.full(shape, b, dtype)
                if len(self.empty_cls):
                    neg = -math.log((1 - 1e-6) / 1e-6)
                    bias = bias.at[jnp.asarray(list(self.empty_cls))].set(neg)
                return bias
            return jnp.zeros(shape, dtype)

        convs = [
            MaskedConv1D(self.feat_dim, self.kernel_size,
                         use_bias=not self.with_ln, name=f"head{i}")
            for i in range(self.num_layers - 1)
        ]
        norms = [
            LayerNorm1D(self.feat_dim, name=f"norm{i}") if self.with_ln else None
            for i in range(self.num_layers - 1)
        ]
        final = nn.Conv(
            self.out_dim, (self.kernel_size,), padding="SAME",
            bias_init=final_bias_init, name="final",
        )
        outs = []
        for f, m in zip(feats, masks):
            cur = f
            for conv, norm in zip(convs, norms):
                cur, _ = conv(cur, m)
                if norm is not None:
                    cur = norm(cur)
                cur = nn.relu(cur)
            out = final(cur) * m.astype(cur.dtype)[..., None]
            outs.append(out)
        return outs


class Scale(nn.Module):
    """Learnable scalar (blocks.py Scale), one per FPN level."""

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, (), jnp.float32)
        return x * s


class ActionMambaDetector(nn.Module):
    """PtTransformer equivalent (meta_archs.py:167). Forward returns per-level
    logits/offsets; label assignment, loss and decode are standalone methods
    usable under jit."""

    input_dim: int
    num_classes: int
    max_seq_len: int = 2304
    embd_dim: int = 512
    fpn_dim: Optional[int] = None   # defaults to embd_dim
    head_dim: Optional[int] = None  # defaults to embd_dim
    backbone_arch: Tuple[int, int, int] = (2, 2, 5)
    scale_factor: int = 2
    regression_range: Sequence[Sequence[float]] = (
        (0, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 10000),
    )
    fpn_type: str = "identity"
    embd_with_ln: bool = True
    fpn_with_ln: bool = True
    head_with_ln: bool = True
    head_kernel_size: int = 3
    head_num_layers: int = 3
    cls_prior_prob: float = 0.01
    drop_path_rate: float = 0.1
    mixer: str = "dbm"
    impl: str = "auto"
    empty_cls: Sequence[int] = ()

    @property
    def fpn_levels(self) -> int:
        return self.backbone_arch[2] + 1

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        """x (B, T, C_in), mask (B, T) → (cls_logits, offsets, fpn_masks),
        each a list over FPN levels with time-major layout."""
        feats, masks = MambaBackbone(
            n_embd=self.embd_dim, n_embd_ks=3, arch=self.backbone_arch,
            scale_factor=self.scale_factor, with_ln=self.embd_with_ln,
            mixer=self.mixer, drop_path_rate=self.drop_path_rate,
            impl=self.impl, name="backbone",
        )(x, mask, deterministic=deterministic)
        fpn_dim = self.fpn_dim or self.embd_dim
        head_dim = self.head_dim or self.embd_dim
        neck_cls = FPNIdentity if self.fpn_type == "identity" else FPN1D
        feats, masks = neck_cls(
            out_channel=fpn_dim, with_ln=self.fpn_with_ln, name="neck"
        )(feats, masks)
        cls_logits = ConvHead(
            head_dim, self.num_classes, self.head_num_layers,
            self.head_kernel_size, self.head_with_ln,
            prior_prob=self.cls_prior_prob, empty_cls=self.empty_cls,
            name="cls_head",
        )(feats, masks)
        offsets_raw = ConvHead(
            head_dim, 2, self.head_num_layers, self.head_kernel_size,
            self.head_with_ln, name="reg_head",
        )(feats, masks)
        offsets = [
            nn.relu(Scale(name=f"scale{l}")(o)) for l, o in enumerate(offsets_raw)
        ]
        return cls_logits, offsets, masks

    def make_points(self) -> PointGenerator:
        return PointGenerator(
            self.max_seq_len * 8, self.fpn_levels, self.scale_factor,
            self.regression_range,
        )


# ---------------------------------------------------------------------------
# label assignment + loss (pure functions, jit-safe, vectorized over batch)


def label_points(
    points: jax.Array,        # (P, 4) concat over levels
    gt_segments: jax.Array,   # (B, N, 2) padded
    gt_labels: jax.Array,     # (B, N) int
    gt_valid: jax.Array,      # (B, N) bool
    num_classes: int,
    center_sample: str = "radius",
    center_sample_radius: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Vectorized center-sampling assignment (meta_archs.py:463-546).

    Returns cls_targets (B, P, C) in [0,1] and reg_targets (B, P, 2)
    normalized by stride.
    """
    P = points.shape[0]
    ts = points[:, 0]
    range_lo, range_hi = points[:, 1], points[:, 2]
    strides = points[:, 3]

    seg_lo = gt_segments[..., 0][:, None, :]   # (B, 1, N)
    seg_hi = gt_segments[..., 1][:, None, :]
    lens = (seg_hi - seg_lo)                    # (B, 1, N) → bcast (B, P, N)
    left = ts[None, :, None] - seg_lo           # (B, P, N)
    right = seg_hi - ts[None, :, None]
    reg_targets = jnp.stack([left, right], axis=-1)  # (B, P, N, 2)

    if center_sample == "radius":
        centers = 0.5 * (seg_lo + seg_hi)
        t_mins = centers - strides[None, :, None] * center_sample_radius
        t_maxs = centers + strides[None, :, None] * center_sample_radius
        cb_left = ts[None, :, None] - jnp.maximum(t_mins, seg_lo)
        cb_right = jnp.minimum(t_maxs, seg_hi) - ts[None, :, None]
        inside = jnp.minimum(cb_left, cb_right) > 0
    else:
        inside = jnp.min(reg_targets, axis=-1) > 0

    max_reg = jnp.max(reg_targets, axis=-1)    # (B, P, N)
    in_range = (max_reg >= range_lo[None, :, None]) & (
        max_reg <= range_hi[None, :, None]
    )

    lens_b = jnp.broadcast_to(lens, inside.shape)
    big = jnp.asarray(jnp.inf, jnp.float32)
    lens_masked = jnp.where(inside & in_range & gt_valid[:, None, :], lens_b, big)
    min_len = jnp.min(lens_masked, axis=-1)     # (B, P)
    min_idx = jnp.argmin(lens_masked, axis=-1)  # (B, P)

    # multi-GT ties within 1e-3 all contribute their labels (meta_archs:531-541)
    tie = (lens_masked <= (min_len[..., None] + 1e-3)) & (lens_masked < big)
    onehot = jax.nn.one_hot(gt_labels, num_classes)          # (B, N, C)
    cls_targets = jnp.clip(
        jnp.einsum("bpn,bnc->bpc", tie.astype(jnp.float32), onehot), 0.0, 1.0
    )
    reg_sel = jnp.take_along_axis(
        reg_targets, min_idx[..., None, None].repeat(2, -1), axis=2
    )[:, :, 0]                                               # (B, P, 2)
    reg_sel = reg_sel / strides[None, :, None]
    return cls_targets, reg_sel


def tal_losses(
    fpn_masks: List[jax.Array],
    out_cls_logits: List[jax.Array],
    out_offsets: List[jax.Array],
    gt_cls: jax.Array,          # (B, P, C)
    gt_offsets: jax.Array,      # (B, P, 2)
    loss_normalizer: jax.Array,  # scalar EMA state
    num_classes: int,
    label_smoothing: float = 0.0,
    loss_weight: float = 1.0,
    normalizer_momentum: float = 0.9,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Focal + DIoU with EMA'd positive-count normalizer (meta_archs:549-627).
    Returns (loss dict, new_loss_normalizer)."""
    valid_mask = jnp.concatenate(fpn_masks, axis=1) > 0        # (B, P)
    pos_mask = (jnp.sum(gt_cls, -1) > 0) & valid_mask          # (B, P)
    num_pos = jnp.sum(pos_mask)
    new_norm = normalizer_momentum * loss_normalizer + (
        1 - normalizer_momentum
    ) * jnp.maximum(num_pos, 1)

    gt_target = gt_cls * (1 - label_smoothing) + label_smoothing / (num_classes + 1)
    logits = jnp.concatenate(out_cls_logits, axis=1)           # (B, P, C)
    cls_loss_el = sigmoid_focal_loss(logits, gt_target, reduction="none")
    cls_loss = jnp.sum(cls_loss_el * valid_mask[..., None]) / new_norm

    offsets = jnp.concatenate(out_offsets, axis=1)             # (B, P, 2)
    reg_loss_el = ctr_diou_loss_1d(
        offsets.reshape(-1, 2), gt_offsets.reshape(-1, 2), reduction="none"
    ).reshape(pos_mask.shape)
    reg_loss = jnp.sum(reg_loss_el * pos_mask) / new_norm

    final = cls_loss + reg_loss * loss_weight
    return (
        {"cls_loss": cls_loss, "reg_loss": reg_loss, "final_loss": final},
        new_norm,
    )


# ---------------------------------------------------------------------------
# inference decode (device top-k; NMS happens on host afterwards)


def decode_single_video(
    points: List[jax.Array],
    fpn_masks: List[jax.Array],     # (T_l,) per level (batch already indexed)
    cls_logits: List[jax.Array],    # (T_l, C)
    offsets: List[jax.Array],       # (T_l, 2)
    pre_nms_thresh: float = 0.001,
    pre_nms_topk: int = 2000,
    duration_thresh: float = 0.05,
):
    """Per-level sigmoid → static top-k → segments (meta_archs.py:672-736).
    Returns numpy (segs, scores, cls_idxs) with sub-threshold entries dropped.
    """
    segs_all, scores_all, cls_all = [], [], []
    for pts, m, logit, off in zip(points, fpn_masks, cls_logits, offsets):
        C = logit.shape[-1]
        prob = (jax.nn.sigmoid(logit) * m[..., None].astype(logit.dtype)).reshape(-1)
        k = min(pre_nms_topk, prob.shape[0])
        topv, topi = jax.lax.top_k(prob, k)
        pt_idx = topi // C
        cls_idx = topi % C
        off_sel = off[pt_idx]
        pts_sel = pts[pt_idx]
        seg_l = pts_sel[:, 0] - off_sel[:, 0] * pts_sel[:, 3]
        seg_r = pts_sel[:, 0] + off_sel[:, 1] * pts_sel[:, 3]
        keep = (topv > pre_nms_thresh) & ((seg_r - seg_l) > duration_thresh)
        segs = np.asarray(jnp.stack([seg_l, seg_r], -1))
        keep = np.asarray(keep)
        segs_all.append(segs[keep])
        scores_all.append(np.asarray(topv)[keep])
        cls_all.append(np.asarray(cls_idx)[keep])
    return (
        np.concatenate(segs_all, 0),
        np.concatenate(scores_all, 0),
        np.concatenate(cls_all, 0),
    )
