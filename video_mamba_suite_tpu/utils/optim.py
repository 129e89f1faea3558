"""Optimizer factory: AdamW/SGD with no-weight-decay masks and layer decay.

Replaces the reference's per-suite optimizer plumbing: TAL make_optimizer
(libs/utils/train_utils.py:63-128, which excludes norms/biases/_no_weight_decay
params from decay), action-recognition optim_factory.py layer-decay groups,
and the plain Adam of the small suites.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax

# parameter leaf names that never get weight decay — the _no_weight_decay
# convention of the reference (mamba_simple.py:119-123: A_log, D; plus norms,
# biases, embeddings as in TAL train_utils.py:63-128)
NO_DECAY_NAMES = (
    "A_log", "D", "dt_bias", "bias", "conv_bias", "norm_w", "norm_b",
    "scale", "embedding", "pos_embed", "cls_token", "temporal_embed",
    "scan_norm_w", "norm_f_w", "norm_f_b", "logit_scale", "rel_pe",
)


def no_weight_decay_mask(params) -> Any:
    """Pytree mask: True = apply weight decay."""

    def rec(tree, path):
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        leaf_name = path[-1] if path else ""
        if any(leaf_name == n or leaf_name.endswith(n) for n in NO_DECAY_NAMES):
            return False
        # 1-D params (biases, norm scales) get no decay either
        if hasattr(tree, "ndim") and tree.ndim <= 1:
            return False
        return True

    return rec(params, ())


def make_optimizer(
    name: str = "adamw",
    lr: Any = 1e-3,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    momentum: float = 0.9,
    grad_clip: Optional[float] = None,
    params_for_mask=None,
) -> optax.GradientTransformation:
    """Build an optax chain. `lr` may be a float or a schedule."""
    if name == "adamw":
        mask = no_weight_decay_mask(params_for_mask) if params_for_mask is not None else None
        opt = optax.adamw(
            lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            mask=mask if weight_decay else None,
        )
    elif name == "adam":
        opt = optax.adam(lr, b1=b1, b2=b2, eps=eps)
        if weight_decay:
            # reference TAS/dense-captioning use Adam w/ L2-style decay
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    elif name == "sgd":
        opt = optax.sgd(lr, momentum=momentum)
        if weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
