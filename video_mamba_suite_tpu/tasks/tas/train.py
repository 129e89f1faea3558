"""TAS training: CE + truncated-MSE smoothing loss, jitted step, eval loop.

Reference: Trainer in /root/reference/video-mamba-suite/
temporal-action-segmentation/model.py:375-450 — per-stage
CrossEntropy(ignore −100) + 0.15 · mean(clamp((Δ log-softmax over t)², 0, 16)
· mask), Adam(lr, wd=1e-5), ReduceLROnPlateau(0.5, patience 3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.schedules import ReduceLROnPlateau
from ...utils.trainer import TrainerCore
from .data import IGNORE_INDEX, TasBatchGenerator, collate
from .metrics import evaluate_segmentation
from .model import MaTransformer


def tas_loss(stage_logits: jax.Array, targets: jax.Array, mask: jax.Array,
             smooth_weight: float = 0.15, clamp_max: float = 16.0) -> jax.Array:
    """Sum over stages of CE + truncated smoothing MSE (model.py:406-411).

    stage_logits: (S, B, L, C); targets (B, L) with −100 ignore; mask (B, L).
    """
    S, B, L, C = stage_logits.shape
    valid = (targets != IGNORE_INDEX) & (mask > 0)
    safe_t = jnp.where(valid, targets, 0)
    total = jnp.asarray(0.0, jnp.float32)
    for s in range(S):
        logits = stage_logits[s].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
        # reference CE uses mean over non-ignored frames
        ce = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
        # temporal smoothing on log-probs, prev frame detached
        diff = logp[:, 1:, :] - jax.lax.stop_gradient(logp[:, :-1, :])
        sm = jnp.clip(jnp.square(diff), 0, clamp_max)
        sm = jnp.mean(sm * mask[:, 1:, None])
        total = total + ce + smooth_weight * sm
    return total


class TasTrainer:
    """End-to-end trainer for the segmentation task (single host)."""

    def __init__(self, num_classes: int, input_dim: int,
                 num_layers: int = 10, num_f_maps: int = 64,
                 num_decoders: int = 3, channel_masking_rate: float = 0.3,
                 lr: float = 5e-4, weight_decay: float = 1e-5,
                 mixer: str = "vim", impl: str = "auto", seed: int = 0,
                 use_mesh: bool = False):
        self.model = MaTransformer(
            num_decoders=num_decoders, num_layers=num_layers,
            num_f_maps=num_f_maps, input_dim=input_dim,
            num_classes=num_classes, channel_masking_rate=channel_masking_rate,
            mixer=mixer, impl=impl,
        )
        self.num_classes = num_classes
        self.rng = jax.random.PRNGKey(seed)
        self.lr = lr
        self.plateau = ReduceLROnPlateau(factor=0.5, patience=3)
        self._lr_scale = 1.0
        self.tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.adam(learning_rate),
            )
        )(learning_rate=lr)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        @jax.jit
        def _train_step(params, opt_state, rng, feats, targets, mask):
            def loss_fn(p):
                logits = self.model.apply(
                    p, feats, mask, deterministic=False,
                    rngs={"dropout": rng},
                )
                return tas_loss(logits, targets, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def _predict(params, feats, mask):
            logits = self.model.apply(params, feats, mask, deterministic=True)
            return jnp.argmax(logits[-1], axis=-1), jax.nn.softmax(logits[-1], -1)

        self._train_step = _train_step
        self._predict = _predict

    def init(self, feats, mask):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.core.prepare(self.model.init(
            {"params": k, "dropout": k}, feats, mask, deterministic=True
        ))
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        """Checkpoint (reference: TAS epoch .model/.opt files, model.py:441)."""
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, feats, mask, step=None):
        if self.params is None:
            self.init(feats, mask)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)

    def set_lr_scale(self, scale: float):
        if scale != self._lr_scale:
            self._lr_scale = scale
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                self.lr * scale, jnp.float32
            )

    def train_epoch(self, batch_gen: TasBatchGenerator, batch_size: int,
                    if_warp: bool = False) -> Dict[str, float]:
        epoch_loss, nb, correct, total = 0.0, 0, 0, 0
        while batch_gen.has_next():
            feats, targets, mask, _ = batch_gen.next_batch(batch_size, if_warp)
            if self.params is None:
                self.init(feats, mask)
            self.rng, k = jax.random.split(self.rng)
            feats_s, targets_s, mask_s = self.core.shard((feats, targets, mask))
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, k, feats_s, targets_s, mask_s
            )
            epoch_loss += float(loss)
            nb += 1
            preds, _ = self._predict(self.params, feats, mask)
            valid = (targets != IGNORE_INDEX) & (mask > 0)
            correct += int(((np.asarray(preds) == targets) & valid).sum())
            total += int(valid.sum())
        batch_gen.reset()
        scale = self.plateau.step(epoch_loss)
        self.set_lr_scale(scale)
        return {"loss": epoch_loss / max(nb, 1), "acc": correct / max(total, 1)}

    def evaluate(self, items: List[Tuple[np.ndarray, np.ndarray]]) -> Dict[str, float]:
        """items: list of (features (C,L), labels (L,))."""
        preds, gts = [], []
        for f, l in items:
            feats, targets, mask = collate([(f, l)])
            p, _ = self._predict(self.params, feats, mask)
            n = len(l)
            preds.append(np.asarray(p[0][:n]))
            gts.append(l)
        return evaluate_segmentation(preds, gts)
