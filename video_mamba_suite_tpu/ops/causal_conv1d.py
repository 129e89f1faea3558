"""Depthwise causal 1-D convolution (width 2–4) with optional fused SiLU.

Capability match for the reference CUDA package
(/root/reference/causal-conv1d/csrc/causal_conv1d_fwd.cu and
 /root/reference/causal-conv1d/causal_conv1d/causal_conv1d_interface.py).

TPU-native layout: x is (batch, seqlen, dim) — a width-W causal depthwise conv
is W shifted elementwise multiply-adds, which XLA fuses into neighbouring ops;
no native kernel is needed (the CUDA version exists only because of the
channels-first smem halo exchange, which has no TPU analogue).

The decode-step `causal_conv1d_update` mirrors
causal_conv1d_interface.py:69-83 but is functional: it returns the new state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _apply_activation(x: jax.Array, activation: Optional[str]) -> jax.Array:
    if activation is None:
        return x
    if activation in ("silu", "swish"):
        return jax.nn.silu(x)
    raise ValueError(f"unsupported activation {activation!r}")


def causal_conv1d_ref(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
    reverse: bool = False,
) -> jax.Array:
    """Reference causal depthwise conv.

    Args:
      x:      (batch, seqlen, dim)
      weight: (width, dim)   [reference uses (dim, width); transposed so dim
                              rides the lane axis]
      bias:   (dim,), optional
      activation: None | 'silu' | 'swish'
      reverse: anti-causal direction — out == flip(conv(flip(x))), i.e. the
        backward stream of bidirectional mixers computed WITHOUT the two
        flip copies.

    out[t] = sum_k weight[k] * x[t - (W-1) + k], zero-padded on the left
    (right for reverse).
    """
    width = weight.shape[0]
    seqlen = x.shape[1]
    if reverse:
        padded = jnp.pad(x, ((0, 0), (0, width - 1), (0, 0)))
    else:
        padded = jnp.pad(x, ((0, 0), (width - 1, 0), (0, 0)))
    out = jnp.zeros_like(x, dtype=jnp.promote_types(x.dtype, weight.dtype))
    for k in range(width):
        tap = weight[width - 1 - k] if reverse else weight[k]
        out = out + padded[:, k : k + seqlen, :] * tap[None, None]
    if bias is not None:
        out = out + bias[None, None]
    return _apply_activation(out, activation).astype(x.dtype)


# The shifted-add formulation IS the fast path on TPU (XLA fuses it);
# keep a distinct name for API parity with the reference's kernel/ref split.
causal_conv1d = causal_conv1d_ref


def causal_conv1d_update(
    x: jax.Array,
    conv_state: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single-token rolling conv-state update for autoregressive decode.

    Args:
      x:          (batch, dim) — new token's channel vector.
      conv_state: (batch, width, dim) — rolling window, oldest first.
      weight:     (width, dim)
    Returns:
      (out, new_conv_state) with out (batch, dim).

    Mirrors /root/reference/causal-conv1d/.../causal_conv1d_interface.py:85-96
    (roll left, write newest at the end, dot with the taps).
    """
    new_state = jnp.concatenate([conv_state[:, 1:, :], x[:, None, :]], axis=1)
    out = jnp.sum(new_state * weight[None], axis=1)
    if bias is not None:
        out = out + bias[None]
    return _apply_activation(out, activation).astype(x.dtype), new_state
