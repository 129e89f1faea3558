"""1-D multi-scale deformable attention (MSDeformAttn for temporal data).

Capability match for the reference CUDA op
(/root/reference/video-mamba-suite/video-dense-captioning/pdvc/ops/src/ +
functions/ms_deform_attn_func.py:44-80 pytorch fallback + modules/
ms_deform_attn.py:30-140). The reference lifts 1-D sampling into 2-D
grid_sample with a dummy height axis for the CUDA kernel; on TPU the natural
form is a linear-interp gather over each level, which XLA lowers to
vectorized dynamic-gathers — no custom kernel needed at PDVC's scales
(queries ≈ 100, points ≈ 4/level).

Sampling convention (align_corners=False, border padding): a normalized
location x ∈ [0, 1] over a level of length T samples at pixel coordinate
x·T − 0.5, clamped to [0, T−1].
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _linear_sample_1d(value: jax.Array, loc: jax.Array) -> jax.Array:
    """value (B, T, C); loc (B, Q, P) normalized [0,1] → (B, Q, P, C)."""
    B, T, C = value.shape
    x = loc * T - 0.5
    x0 = jnp.floor(x)
    w1 = x - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, T - 1)
    i1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, T - 1)
    # vectorized gather: flatten query·point dims
    flat0 = i0.reshape(B, -1)
    flat1 = i1.reshape(B, -1)
    g0 = jnp.take_along_axis(value, flat0[..., None], axis=1)
    g1 = jnp.take_along_axis(value, flat1[..., None], axis=1)
    out = g0 * (1 - w1.reshape(B, -1)[..., None]) + g1 * w1.reshape(B, -1)[..., None]
    return out.reshape(B, *loc.shape[1:], C)


def ms_deform_attn_core(
    value: jax.Array,                 # (B, ΣT_l, H, D)
    temporal_shapes: Sequence[int],   # [T_0, …]
    sampling_locations: jax.Array,    # (B, Q, H, L, P) in [0, 1]
    attention_weights: jax.Array,     # (B, Q, H, L, P), softmaxed over L·P
) -> jax.Array:
    """Pure-jnp core (ms_deform_attn_func.py:44-80 semantics, 1-D)."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(temporal_shapes)
    starts = [0]
    for t in temporal_shapes[:-1]:
        starts.append(starts[-1] + t)
    out = jnp.zeros((B, Q, H, D), jnp.promote_types(value.dtype, jnp.float32))
    for l, T in enumerate(temporal_shapes):
        v_l = value[:, starts[l] : starts[l] + T]       # (B, T, H, D)
        v_l = v_l.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        loc = sampling_locations[:, :, :, l]             # (B, Q, H, P)
        loc = loc.transpose(0, 2, 1, 3).reshape(B * H, Q, -1)
        sampled = _linear_sample_1d(v_l, loc)            # (B·H, Q, P, D)
        w = attention_weights[:, :, :, l].transpose(0, 2, 1, 3)
        w = w.reshape(B * H, Q, -1)[..., None]
        contrib = jnp.sum(sampled * w, axis=2)           # (B·H, Q, D)
        out = out + contrib.reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


class MSDeformAttn1D(nn.Module):
    """Module wrapper (ms_deform_attn.py:30-140): offset/weight projections
    with the reference's directional bias init, value/output projections."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4

    @nn.compact
    def __call__(self, query, reference_points, input_flatten,
                 temporal_shapes: Sequence[int], input_padding_mask=None):
        """query (B, Q, C); reference_points (B, Q, L, 1 or 2) in [0,1];
        input_flatten (B, ΣT, C); mask (B, ΣT) True = padding."""
        B, Q, _ = query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // H

        def offset_bias_init(key, shape, dtype=jnp.float32):
            # alternating ±(i+1) directions (ms_deform_attn.py:63-71, 1-D)
            thetas = jnp.arange(H, dtype=jnp.float32) * (2 * math.pi / H)
            grid = jnp.cos(thetas)
            grid = grid / jnp.max(jnp.abs(grid))
            grid = jnp.tile(grid[:, None, None], (1, L, P))
            grid = grid * (jnp.arange(1, P + 1, dtype=jnp.float32))[None, None]
            return grid.reshape(-1).astype(dtype)

        value = nn.Dense(self.d_model, name="value_proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(B, -1, H, D)

        offsets = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=offset_bias_init, name="sampling_offsets",
        )(query).reshape(B, Q, H, L, P)
        weights = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        weights = jax.nn.softmax(weights, axis=-1).reshape(B, Q, H, L, P)

        shapes = jnp.asarray(temporal_shapes, jnp.float32)
        if reference_points.shape[-1] == 1:
            loc = (
                reference_points[:, :, None, :, None, 0]
                + offsets / shapes[None, None, None, :, None]
            )
        else:  # (center, length) reference boxes
            loc = (
                reference_points[:, :, None, :, None, 0]
                + offsets / P * reference_points[:, :, None, :, None, 1] * 0.5
            )
        out = ms_deform_attn_core(value, list(temporal_shapes), loc, weights)
        return nn.Dense(self.d_model, name="output_proj")(out.astype(query.dtype))
