"""Model EMA as a pure pytree transform (TAL ModelEma train_utils.py:229-254,
timm ModelEma in action-recognition)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax


class EmaState(NamedTuple):
    params: Any
    decay: float


def ema_init(params, decay: float = 0.999) -> EmaState:
    return EmaState(params=jax.tree_util.tree_map(lambda x: x, params), decay=decay)


def ema_update(state: EmaState, new_params) -> EmaState:
    d = state.decay
    upd = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params
    )
    return EmaState(params=upd, decay=d)
