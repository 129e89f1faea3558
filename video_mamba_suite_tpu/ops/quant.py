"""Int8 (w8a8) serving-mode matmul for TPU MXU.

The v5e MXU runs int8×int8→int32 at ~2× the bf16 rate; measured at the
TimeMamba-B MLP shape (25088×768 @ 768×3072): bf16→bf16 0.97 ms vs
dynamic-w8a8 0.78 ms (1.24×, including the per-token activation
quantization pass) and 0.64 ms from pre-quantized activations (1.52×).

Scheme (inference-only; gradients are stopped through the rounding):
  * weights: symmetric per-output-channel int8, scale = max|w|/127 —
    quantized on the fly from the stored fp32 params so checkpoints,
    weight porting (models/convert.py) and the parameter tree are
    UNCHANGED vs the bf16 path;
  * activations: symmetric per-token (per last-axis-row) dynamic int8 —
    no calibration pass needed, robust to outlier tokens.

The reference has no quantized path (pure bf16/fp16 autocast,
egocentric-understanding/engine/main_lavila_finetune_cls.py AMP) — this
is a TPU-native serving addition, opt-in via `quant=True` on the vision
towers; the benchmark contract's primary metric stays bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jax.Array, axis: int, eps: float = 1e-8):
    """Symmetric int8 quantization along all axes except `axis` groups.

    Returns (q, scale) with x ≈ q * scale; scale has `axis` reduced to
    broadcastable form. `axis` is the axis REDUCED over (the contraction
    axis gets folded into the scale of the other operand).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jax.Array, kernel: jax.Array,
                out_dtype=jnp.bfloat16) -> jax.Array:
    """x (..., K) @ kernel (K, N) via dynamic w8a8 → (..., N) in out_dtype.

    Per-token activation scales × per-out-channel weight scales; int32
    accumulation on the MXU. Inference-only: the quantization is wrapped
    in stop_gradient (a straight-through estimator is NOT provided — the
    training path should use the bf16 matmuls).
    """
    x = jax.lax.stop_gradient(x)
    kernel = jax.lax.stop_gradient(kernel)
    xq, xs = quantize_symmetric(x, axis=-1)          # (..., K), (..., 1)
    wq, ws = quantize_symmetric(kernel, axis=0)      # (K, N), (1, N)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * ws.reshape(
        (1,) * (acc.ndim - 1) + (-1,))
    return out.astype(out_dtype)
