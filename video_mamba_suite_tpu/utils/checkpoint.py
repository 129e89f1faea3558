"""Orbax checkpointing: model/EMA/optimizer/epoch in one tree.

Semantic match for the reference's per-suite torch.save dicts (SURVEY.md §5:
TAL save_checkpoint train_eval.py:89-106, TAS epoch files model.py:441-443,
dense-captioning model-best.pth, action-recognition auto_load_model).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _mgr(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any,
                    max_to_keep: int = 3) -> None:
    """state: any pytree, e.g. {'params':…, 'opt_state':…, 'ema':…, 'epoch':…}."""
    mgr = _mgr(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    """Restore; with a `template` pytree the result matches its structure
    and shardings/dtypes."""
    mgr = _mgr(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    if template is not None:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        out = mgr.restore(step)
    mgr.close()
    return out
