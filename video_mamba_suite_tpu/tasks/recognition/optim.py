"""Layer-wise LR decay for ViT-style finetuning.

Reference: /root/reference/video-mamba-suite/action-recognition/
optim_factory.py (LayerDecayValueAssigner): per-parameter LR scale
decay^(num_layers − layer_id), layer id from the parameter path.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import optax


def _layer_id_from_path(path: tuple, num_layers: int) -> int:
    """patch/pos embeds → 0; mixerN/normN/blockN/dpN → N+1; else final."""
    joined = "/".join(str(p) for p in path)
    if any(s in joined for s in ("patch_embed", "pos_embed", "cls_token",
                                 "temporal_embed", "token_embedding")):
        return 0
    m = re.search(r"(?:mixer|norm|block|dp|layer|resblock)(\d+)", joined)
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1


def layer_decay_param_groups(params, num_layers: int, decay: float):
    """Pytree of per-leaf LR scales (optim_factory.py get_num_layer_for_vit)."""

    def rec(tree, path):
        if isinstance(tree, dict):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        lid = _layer_id_from_path(path, num_layers)
        return decay ** (num_layers + 1 - lid)

    return rec(params, ())


def scale_by_layer_decay(params, num_layers: int, decay: float
                         ) -> optax.GradientTransformation:
    scales = layer_decay_param_groups(params, num_layers, decay)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
