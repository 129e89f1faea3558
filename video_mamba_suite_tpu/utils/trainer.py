"""Shared trainer core: mesh-parallel execution + checkpoint/resume.

The reference bootstraps DDP in four different per-suite idioms (SURVEY.md
§2.4: dense-captioning train.py:35-120, VTG distribute_utils.py, avion
distributed.py:81, action-recognition utils.py:311-340) and checkpoints in
five (SURVEY.md §5). Here ONE core owns both concerns for all seven task
trainers: a `data` mesh with replicated params and batch sharding (the DDP
equivalent — XLA inserts the grad all-reduce), plus orbax save/restore of
the trainer's full state.

Usage pattern inside a task trainer:

    self.core = TrainerCore(use_mesh=use_mesh, ema_decay=ema_decay)
    ...
    self.params = self.core.prepare(self.params)          # replicate
    self.opt_state = self.core.prepare(self.opt_state)
    ...
    batch = self.core.shard(batch)                        # split over 'data'
    ...
    self.core.save(dir, step, self.state_dict())
    self.load_state_dict(self.core.restore(dir, self.state_dict()))
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

from ..parallel.mesh import make_mesh, replicate_params, shard_batch


class TrainerCore:
    """Mesh + checkpoint plumbing shared by every task trainer.

    With `use_mesh` (or an explicit `mesh`), parameters/optimizer state are
    replicated across the `data` axis and batches are sharded over it; the
    jitted train step then runs SPMD with XLA-compiled gradient collectives
    — functionally the reference's DistributedDataParallel. Without a mesh
    everything is a no-op pass-through (single-device semantics unchanged).
    """

    def __init__(self, use_mesh: bool = False, mesh=None):
        self.mesh = mesh if mesh is not None else (
            make_mesh(axes=("data",)) if use_mesh else None
        )

    # --- sharding -----------------------------------------------------
    def prepare(self, tree):
        """Replicate a parameter/optimizer pytree across the mesh."""
        if self.mesh is None or tree is None:
            return tree
        return replicate_params(self.mesh, tree)

    def shard(self, batch):
        """Shard a batch pytree's leading axis over the 'data' mesh axis.

        Every leaf's axis 0 must be divisible by the data-axis size (the
        collate fns pad/bucket to fixed batch sizes, so this holds by
        construction in the task pipelines).
        """
        if self.mesh is None:
            return batch
        return shard_batch(self.mesh, batch)

    @property
    def data_parallel_size(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape["data"]

    # --- checkpointing (orbax) ----------------------------------------
    def save(self, directory: str, step: int, state: Dict[str, Any]) -> None:
        """Checkpoint a state dict (params/opt_state/ema/counters…)."""
        from .checkpoint import save_checkpoint

        save_checkpoint(directory, step, state)

    def restore(self, directory: str, template: Dict[str, Any],
                step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Restore the latest (or given) step; None if no checkpoint exists.

        The template supplies structure/dtype/sharding — restored arrays
        land replicated on the mesh when the template values are.
        """
        from .checkpoint import latest_step, restore_checkpoint

        if step is None:
            step = latest_step(directory)
        if step is None:
            return None
        return restore_checkpoint(directory, step, template=template)

    def latest_step(self, directory: str) -> Optional[int]:
        from .checkpoint import latest_step

        return latest_step(directory)
