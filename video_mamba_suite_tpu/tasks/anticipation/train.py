"""Anticipation trainer: per-frame CE over work+anticipation positions.

Reference: /root/reference/video-mamba-suite/action-anticipation/src/
rekognition_online_action_detection/engines/lstr/lstr_trainer.py — CE over
per-frame targets (multi-label soft targets in EK100), Adam, warmup schedule.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.optim import make_optimizer
from ...utils.schedules import make_schedule
from ...utils.trainer import TrainerCore
from .metrics import perframe_average_precision, topk_recall
from .model import LSTRMamba


def anticipation_loss(scores: jax.Array, targets: jax.Array,
                      ignore_index: int = -100) -> jax.Array:
    """Per-position CE with ignore index; targets (B, P) int."""
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)


class AnticipationTrainer:
    def __init__(self, model: LSTRMamba, lr: float = 7e-5,
                 weight_decay: float = 5e-5, warmup_steps: int = 50,
                 total_steps: int = 5000, seed: int = 0,
                 use_mesh: bool = False):
        self.model = model
        sched = make_schedule("cosine", lr, total_steps, warmup_steps)
        self.tx = make_optimizer("adamw", lr=sched, weight_decay=weight_decay)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        model_, tx = self.model, self.tx

        @jax.jit
        def step(params, opt_state, rng, visual, motion, targets):
            def loss_fn(p):
                out = model_.apply(
                    p, visual, motion, deterministic=False,
                    rngs={"dropout": rng},
                )
                return anticipation_loss(out["score"], targets)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def predict(params, visual, motion):
            out = model_.apply(params, visual, motion, deterministic=True)
            return jax.nn.softmax(out["score"], axis=-1)

        self._step = step
        self._predict = predict

    def init(self, visual, motion):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.core.prepare(self.model.init(
            {"params": k, "dropout": k}, visual, motion, deterministic=True
        ))
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        """Checkpoint (reference engines/base save/resume contract)."""
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, visual, motion, step=None):
        if self.params is None:
            self.init(visual, motion)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)

    def train_step(self, visual, motion, targets) -> float:
        if self.params is None:
            self.init(visual, motion)
        self.rng, k = jax.random.split(self.rng)
        visual_s, motion_s, targets_s = self.core.shard(
            (visual, motion, targets))
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, k, visual_s, motion_s, targets_s
        )
        return float(loss)

    def evaluate(self, visual, motion, targets) -> Dict[str, float]:
        probs = np.asarray(self._predict(self.params, visual, motion))
        flat_p = probs.reshape(-1, probs.shape[-1])
        flat_t = np.asarray(targets).reshape(-1)
        valid = flat_t != -100
        res = perframe_average_precision(flat_p[valid], flat_t[valid])
        return {
            "mean_AP": res["mean_AP"],
            "recall@5": topk_recall(flat_p[valid], flat_t[valid], k=5),
        }
