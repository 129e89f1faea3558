"""LayerNorm / RMSNorm with fused residual-add, pre-norm semantics.

Capability match for the reference Triton fused add+norm
(/root/reference/mamba/mamba_ssm/ops/triton/layernorm.py:19-503). XLA fuses
the residual add into the norm natively, so these are plain jnp expressions
that preserve the reference's *semantics*: prenorm returns
(normed, residual) with optional fp32 residual accumulation
(`residual_in_fp32`, layernorm.py:382-401).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last axis, computed in fp32."""
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype_in)


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """RMSNorm over the last axis, computed in fp32 (layernorm.py:35-42)."""
    dtype_in = x.dtype
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(ms + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype_in)


def fused_add_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    prenorm: bool = True,
    residual_in_fp32: bool = True,
    eps: float = 1e-5,
    is_rms_norm: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(residual add) → norm, returning (normed, new_residual).

    Semantics of the reference `layer_norm_fn(..., prenorm=True)`
    (layernorm.py:464-478): new_residual = x + residual (fp32 if requested),
    normed = Norm(new_residual).
    """
    if residual is not None:
        res = x.astype(jnp.float32) + residual.astype(jnp.float32)
    else:
        res = x.astype(jnp.float32)
    norm_fn = rms_norm if is_rms_norm else layer_norm
    normed = norm_fn(res, weight, bias, eps=eps).astype(x.dtype)
    if not prenorm:
        return normed, None
    res_out = res if residual_in_fp32 else res.astype(x.dtype)
    return normed, res_out
