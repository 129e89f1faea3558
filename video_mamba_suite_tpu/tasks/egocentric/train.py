"""CLIP pretraining loop (LaViLa/AVION engine equivalent).

Reference: /root/reference/video-mamba-suite/egocentric-understanding/
engine/main_lavila_pretrain.py:124-450 — DDP CLIP training with ClipLoss,
AdamW(β₂=0.98), cosine schedule, bf16 autocast. Here: one jitted train step
over a data-sharded mesh; the contrastive matmul pulls the global batch via
GSPMD (see losses.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...models.clip import CLIP
from ...parallel.mesh import make_mesh, replicate_params, shard_batch
from ...utils.optim import make_optimizer
from ...utils.schedules import make_schedule
from ...utils.trainer import TrainerCore
from .losses import clip_loss


class ClipPretrainer:
    def __init__(self, model: CLIP, lr: float = 3e-5, weight_decay: float = 0.01,
                 warmup_steps: int = 100, total_steps: int = 10000,
                 grad_clip: float = 1.0, use_mesh: bool = False, seed: int = 0):
        self.model = model
        sched = make_schedule("cosine", lr, total_steps, warmup_steps)
        self.tx = make_optimizer("adamw", lr=sched, weight_decay=weight_decay,
                                 b2=0.98, grad_clip=grad_clip)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.mesh = make_mesh(axes=("data",)) if use_mesh else None
        self.core = TrainerCore(mesh=self.mesh)

        model_ = self.model
        tx = self.tx

        @jax.jit
        def step(params, opt_state, rng, videos, texts):
            def loss_fn(p):
                img, txt, scale = model_.apply(
                    p, videos, texts, deterministic=False,
                    rngs={"dropout": rng},
                )
                return clip_loss(img, txt, scale)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def encode(params, videos, texts):
            return model_.apply(params, videos, texts, deterministic=True)

        self._step = step
        self._encode = encode

    def init(self, videos, texts):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(
            {"params": k, "dropout": k}, videos, texts, deterministic=True
        )
        self.opt_state = self.tx.init(self.params)
        if self.mesh is not None:
            self.params = replicate_params(self.mesh, self.params)
            self.opt_state = replicate_params(self.mesh, self.opt_state)

    def train_step(self, videos, texts) -> float:
        if self.params is None:
            self.init(videos[:1], texts[:1])
        if self.mesh is not None:
            videos, texts = shard_batch(self.mesh, (videos, texts))
        self.rng, k = jax.random.split(self.rng)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, k, videos, texts
        )
        return float(loss)

    def encode(self, videos, texts):
        img, txt, scale = self._encode(self.params, videos, texts)
        return np.asarray(img), np.asarray(txt), float(scale)

    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        """Checkpoint (reference latest/best files, main_lavila_pretrain.py)."""
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, videos, texts, step=None):
        if self.params is None:
            self.init(videos, texts)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)
