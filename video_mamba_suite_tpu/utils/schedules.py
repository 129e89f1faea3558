"""LR schedules: warmup+cosine (TAL train_utils.py:129-197), multistep,
linear, constant, and a host-side reduce-on-plateau (TAS model.py:394)."""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def make_schedule(
    name: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 0.0,
    milestones: Optional[Sequence[int]] = None,
    gamma: float = 0.1,
):
    if name == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else base_lr,
            peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1) if warmup_steps else 0,
            decay_steps=max(total_steps, 1),
            end_value=min_lr,
        )
        return sched
    if name == "multistep":
        boundaries = {int(m): gamma for m in (milestones or [])}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
        if warmup_steps:
            warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
            return optax.join_schedules([warm, sched], [warmup_steps])
        return sched
    if name == "linear":
        sched = optax.linear_schedule(base_lr, min_lr, max(total_steps, 1))
        if warmup_steps:
            warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
            return optax.join_schedules([warm, sched], [warmup_steps])
        return sched
    if name == "constant":
        if warmup_steps:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, base_lr, warmup_steps),
                 optax.constant_schedule(base_lr)],
                [warmup_steps],
            )
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown schedule {name!r}")


class ReduceLROnPlateau:
    """Host-side plateau scheduler (TAS Trainer, model.py:394): multiply a
    scale by `factor` after `patience` non-improving epochs. Use the scale as
    an optax injected hyperparam or rebuild the optimizer."""

    def __init__(self, factor: float = 0.5, patience: int = 3,
                 mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        improved = (
            self.best is None
            or (metric < self.best if self.mode == "min" else metric > self.best)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale
