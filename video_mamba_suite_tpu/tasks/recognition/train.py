"""K400 finetune trainer for ViViM.

Reference: /root/reference/video-mamba-suite/action-recognition/
run_class_finetuning.py (mixup + soft CE + layer-decay AdamW + EMA + cosine)
and engines/engine_for_finetuning.py train/val loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...models.vivim import ViViM
from ...utils.ema import ema_init, ema_update
from ...utils.optim import no_weight_decay_mask
from ...utils.schedules import make_schedule
from ...utils.trainer import TrainerCore
from .augment import mixup_cutmix, one_hot_smooth
from .engine import merge_multi_view, topk_accuracy
from .optim import scale_by_layer_decay


def soft_target_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """SoftTargetCrossEntropy (timm) used with mixup."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


class RecognitionTrainer:
    def __init__(self, model: ViViM, num_classes: int, lr: float = 1e-3,
                 weight_decay: float = 0.05, layer_decay: float = 0.75,
                 warmup_steps: int = 100, total_steps: int = 10000,
                 mixup_alpha: float = 0.8, cutmix_alpha: float = 1.0,
                 smoothing: float = 0.1, ema_decay: float = 0.9999,
                 seed: int = 0, use_mesh: bool = False):
        assert model.num_classes == num_classes
        self.model = model
        self.num_classes = num_classes
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.smoothing = smoothing
        self.ema_decay = ema_decay
        self.rng = jax.random.PRNGKey(seed)
        self.sched = make_schedule("cosine", lr, total_steps, warmup_steps)
        self._lr = lr
        self.layer_decay = layer_decay
        self.weight_decay = weight_decay
        self.params = None
        self.opt_state = None
        self.tx = None
        self.ema = None
        self.core = TrainerCore(use_mesh=use_mesh)

    def init(self, videos):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(
            {"params": k, "dropout": k}, videos, deterministic=True
        )
        chain = [optax.clip_by_global_norm(1.0)]
        if self.layer_decay and self.layer_decay < 1.0:
            chain.append(
                scale_by_layer_decay(self.params, self.model.depth, self.layer_decay)
            )
        chain.append(optax.adamw(
            self.sched, weight_decay=self.weight_decay,
            mask=no_weight_decay_mask(self.params),
        ))
        self.tx = optax.chain(*chain)
        self.params = self.core.prepare(self.params)
        self.opt_state = self.core.prepare(self.tx.init(self.params))
        self.ema = ema_init(self.params, self.ema_decay)

        model, tx = self.model, self.tx
        num_classes = self.num_classes
        mixup_alpha, cutmix_alpha, smoothing = (
            self.mixup_alpha, self.cutmix_alpha, self.smoothing
        )

        @jax.jit
        def step(params, opt_state, ema, rng, videos, labels):
            k_mix, k_drop = jax.random.split(rng)
            if mixup_alpha > 0 or cutmix_alpha > 0:
                videos, targets = mixup_cutmix(
                    k_mix, videos, labels, num_classes,
                    mixup_alpha, cutmix_alpha, smoothing=smoothing,
                )
            else:
                targets = one_hot_smooth(labels, num_classes, smoothing)

            def loss_fn(p):
                logits = model.apply(
                    p, videos, deterministic=False, rngs={"dropout": k_drop}
                )
                return soft_target_cross_entropy(logits, targets)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # EMA folded into the jitted step: outside jit the tree_map
            # dispatches one device op per leaf (measured 5x a whole TAL
            # step on the tunneled chip)
            ema = ema_update(ema, params)
            return params, opt_state, ema, loss

        @jax.jit
        def predict(params, videos):
            return jax.nn.softmax(
                model.apply(params, videos, deterministic=True), axis=-1
            )

        self._step = step
        self._predict = predict

    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state,
                    ema=self.ema.params)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.ema = self.ema._replace(params=state["ema"])

    def save(self, directory: str, step: int):
        """Checkpoint (reference utils.save_model w/ EMA, utils.py)."""
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, videos, step=None):
        if self.params is None:
            self.init(videos[:1])
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)

    def train_step(self, videos, labels) -> float:
        if self.params is None:
            self.init(videos[:1])
        self.rng, k = jax.random.split(self.rng)
        videos_s, labels_s = self.core.shard((videos, labels))
        self.params, self.opt_state, self.ema, loss = self._step(
            self.params, self.opt_state, self.ema, k, videos_s, labels_s
        )
        return float(loss)

    def evaluate(self, videos: np.ndarray, labels: np.ndarray,
                 video_ids: Optional[np.ndarray] = None,
                 batch_size: int = 8, use_ema: bool = False) -> Dict[str, float]:
        """Multi-view eval: rows sharing a video_id are merged
        (engine_for_finetuning.py merge :272)."""
        params = self.ema.params if (use_ema and self.ema) else self.params
        probs = []
        for i in range(0, len(videos), batch_size):
            probs.append(np.asarray(self._predict(params, videos[i:i+batch_size])))
        probs = np.concatenate(probs, 0)
        if video_ids is not None:
            uniq, merged = merge_multi_view(probs, video_ids)
            lab = np.array([labels[video_ids == u][0] for u in uniq])
            return topk_accuracy(merged, lab)
        return topk_accuracy(probs, labels)
