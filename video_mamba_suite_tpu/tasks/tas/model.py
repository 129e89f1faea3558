"""ASFormer-Mamba model (MaTransformer).

Reference: /root/reference/video-mamba-suite/temporal-action-segmentation/model.py
  Encoder (mamba=True):  conv1x1 → N× AttModule_mamba(dilated-conv FF →
      instance-norm → MaskMambaBlock, α·out + FF, residual) → conv_out
      (model.py:232-307)
  Decoder: conv1x1 → N× AttModule(dilated-conv FF → instance-norm →
      sliding-window cross-attn(q,k from decoder, v from encoder) ·α +
      FF → conv1x1 → residual) → conv_out  (model.py:215-332)
  MaTransformer: encoder + 3 decoders on softmax(prev stage), α_s = e^(−3s)
      (model.py:358-373, exponential_descrease :15)

Layout: (B, L, C); masks are (B, L) floats.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.common import (
    MaskMambaBlock,
    instance_norm_1d,
    sliding_window_attention,
)


def exponential_descrease(idx_decoder: int, p: float = 3.0) -> float:
    """(sic) reference name — α decay per decoder stage (model.py:15)."""
    return math.exp(-p * idx_decoder)


class ConvFeedForward(nn.Module):
    """Dilated conv3 + ReLU (model.py:189-198)."""

    features: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = self.dilation
        out = nn.Conv(
            self.features, (3,), padding=[(pad, pad)],
            kernel_dilation=(self.dilation,),
        )(x)
        return nn.relu(out)


class MambaAttModule(nn.Module):
    """AttModule_mamba (model.py:232-250): FF → α·MaskMamba(IN(FF)) + FF →
    dropout → residual, all masked."""

    dim: int
    dilation: int
    alpha: float = 1.0
    drop_path_rate: float = 0.3
    dropout_rate: float = 0.5
    mixer: str = "vim"
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        out = ConvFeedForward(self.dim, self.dilation)(x)
        h = instance_norm_1d(out, mask)
        h, _ = MaskMambaBlock(
            self.dim, mixer=self.mixer, drop_path_rate=self.drop_path_rate,
            impl=self.impl, name="mamba_block",
        )(h, mask, deterministic=deterministic)
        out = self.alpha * h + out
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return (x + out) * mask.astype(x.dtype)[..., None]


class AttnAttModule(nn.Module):
    """Decoder AttModule (model.py:215-230) with sliding-window cross
    attention (q,k from decoder stream, v from encoder features)."""

    dim: int
    dilation: int
    alpha: float
    r1: int = 2
    r2: int = 2
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, f_encoder, mask, deterministic: bool = True):
        out = ConvFeedForward(self.dim, self.dilation)(x)
        h = instance_norm_1d(out, mask)
        q = nn.Conv(self.dim // self.r1, (1,), name="query_conv")(h)
        k = nn.Conv(self.dim // self.r1, (1,), name="key_conv")(h)
        v_src = f_encoder if f_encoder is not None else h
        v = nn.Conv(self.dim // self.r2, (1,), name="value_conv")(v_src)
        att = sliding_window_attention(q, k, v, mask, bl=self.dilation)
        att = nn.Conv(self.dim, (1,), name="conv_out")(nn.relu(att))
        att = att * mask.astype(att.dtype)[..., None]
        out = self.alpha * att + out
        out = nn.Conv(self.dim, (1,), name="conv_1x1")(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return (x + out) * mask.astype(x.dtype)[..., None]


class TasEncoder(nn.Module):
    """Encoder (model.py:271-307) with channel masking dropout."""

    num_layers: int
    num_f_maps: int
    num_classes: int
    channel_masking_rate: float = 0.3
    drop_path_rate: float = 0.3
    mixer: str = "vim"
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        x = x * mask.astype(x.dtype)[..., None]
        if self.channel_masking_rate > 0 and not deterministic:
            # Dropout2d: drop whole channels (model.py:296-299)
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.channel_masking_rate, (x.shape[0], 1, x.shape[2])
            )
            x = jnp.where(keep, x / (1.0 - self.channel_masking_rate), 0.0)
        feat = nn.Conv(self.num_f_maps, (1,), name="conv_1x1")(x)
        for i in range(self.num_layers):
            feat = MambaAttModule(
                self.num_f_maps, dilation=2 ** i, alpha=1.0,
                drop_path_rate=self.drop_path_rate, mixer=self.mixer,
                impl=self.impl, name=f"layer{i}",
            )(feat, mask, deterministic=deterministic)
        out = nn.Conv(self.num_classes, (1,), name="conv_out")(feat)
        out = out * mask.astype(out.dtype)[..., None]
        return out, feat


class TasDecoder(nn.Module):
    """Decoder (model.py:310-332)."""

    num_layers: int
    num_f_maps: int
    num_classes: int
    alpha: float

    @nn.compact
    def __call__(self, x, f_encoder, mask, deterministic: bool = True):
        feat = nn.Conv(self.num_f_maps, (1,), name="conv_1x1")(x)
        for i in range(self.num_layers):
            feat = AttnAttModule(
                self.num_f_maps, dilation=2 ** i, alpha=self.alpha,
                name=f"layer{i}",
            )(feat, f_encoder, mask, deterministic=deterministic)
        out = nn.Conv(self.num_classes, (1,), name="conv_out")(feat)
        out = out * mask.astype(out.dtype)[..., None]
        return out, feat


class MaTransformer(nn.Module):
    """Mamba encoder + `num_decoders` attention decoders (model.py:358-373).

    Returns (num_decoders+1, B, L, num_classes) stage logits.
    """

    num_decoders: int = 3
    num_layers: int = 10
    num_f_maps: int = 64
    input_dim: int = 2048
    num_classes: int = 11
    channel_masking_rate: float = 0.3
    drop_path_rate: float = 0.3
    mixer: str = "vim"
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        out, feat = TasEncoder(
            self.num_layers, self.num_f_maps, self.num_classes,
            self.channel_masking_rate, self.drop_path_rate,
            mixer=self.mixer, impl=self.impl, name="encoder",
        )(x, mask, deterministic=deterministic)
        outputs = [out]
        m = mask.astype(out.dtype)[..., None]
        for s in range(self.num_decoders):
            out, feat = TasDecoder(
                self.num_layers, self.num_f_maps, self.num_classes,
                alpha=exponential_descrease(s), name=f"decoder{s}",
            )(
                jax.nn.softmax(out, axis=-1) * m, feat * m, mask,
                deterministic=deterministic,
            )
            outputs.append(out)
        return jnp.stack(outputs, axis=0)
