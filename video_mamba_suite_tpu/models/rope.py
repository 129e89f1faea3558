"""Rotary position embedding (1-D).

Capability match for /root/reference/video-mamba-suite/video-temporal-grounding/
model/rope.py:46-96 (the `if_rope` option of UniVTG-Mamba and ViM): rotate
feature pairs by position-dependent angles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_rotate(x: jax.Array, base: float = 10000.0) -> jax.Array:
    """Apply rotary embedding over the sequence axis. x (B, L, D), D even."""
    B, L, D = x.shape
    half = D // 2
    freqs = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = jnp.arange(L, dtype=jnp.float32)[:, None] * freqs[None]  # (L, D/2)
    cos = jnp.cos(angles)[None]
    sin = jnp.sin(angles)[None]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )
    return out.astype(x.dtype)
