"""Offline int8 weight quantization for the LM decode/serving path.

The decode loop is weight-streaming-bound (BASELINE.md decode section: at
Mamba-768x12/b8 the per-step floor is ~160 MB of bf16 params, 67% achieved).
``quantize_lm_for_decode`` rewrites a trained variables dict so the big 2D
weights are STORED as int8 with per-channel fp32 scales — halving the HBM
stream the step must read — while every consuming module keeps an identical
interface: ``W8Dense`` / ``W8Embed`` (models/common.py) detect the 'qscale'
collection and read the int8 bytes directly; without it they are exactly
nn.Dense / nn.Embed.

Quantized leaves (symmetric absmax, int8):
  * ``.../in_proj/kernel``, ``.../out_proj/kernel`` — per-OUTPUT-channel
    scales (axis 0 reduced), applied to the matmul output;
  * ``.../embedding/embedding`` — per-ROW scales, applied after the gather
    and (tied head) to the logits' vocab columns.
Everything else (x_proj/dt_proj/conv/A_log/D/norms — ~3% of the bytes at
the 130M shape, and the dt path is precision-sensitive) stays full width.

Reference counterpart: none — the reference's generation benchmark serves
fp16 (mamba/benchmarks/benchmark_generation_mamba_simple.py); this is a
beyond-reference serving mode. Measured on chip in benchmarks/r15_decode_w8.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

_KERNEL_MODULES = ("in_proj", "out_proj")


def _quantize(w, axis: int) -> Tuple[Any, Any]:
    """Symmetric absmax int8 along ``axis`` (the reduced axis)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=axis) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.round(w / jnp.expand_dims(scale, axis)).astype(jnp.int8)
    return q, scale


def quantize_lm_for_decode(variables, cast=jnp.bfloat16):
    """variables (a ``model.init`` dict) → serving variables dict.

    Returns ``{"params": ..., "qscale": ...}`` where the targeted kernels
    are int8 with matching-path scales in 'qscale', and every remaining
    float32 leaf is cast to ``cast`` (pass ``None`` to keep fp32). The
    result drops straight into ``model.apply`` / ``generate``.
    """

    def walk(tree, path) -> Tuple[Dict, Dict]:
        out, scales = {}, {}
        for k, v in tree.items():
            if isinstance(v, dict) or type(v).__name__ == "FrozenDict":
                sub, subs = walk(dict(v), path + (k,))
                out[k] = sub
                if subs:
                    scales[k] = subs
            elif (k == "kernel" and path and path[-1] in _KERNEL_MODULES
                  and v.ndim == 2):
                q, s = _quantize(v, axis=0)        # per-output-channel
                out[k], scales[k] = q, s
            elif k == "embedding" and path and path[-1] == "embedding" \
                    and v.ndim == 2:
                q, s = _quantize(v, axis=1)        # per-row
                out[k], scales[k] = q, s
            elif cast is not None and hasattr(v, "dtype") \
                    and v.dtype == jnp.float32:
                out[k] = v.astype(cast)
            else:
                out[k] = v
        return out, scales

    variables = dict(variables)
    params, qscale = walk(dict(variables.pop("params")), ())
    return {"params": params, "qscale": qscale, **variables}
