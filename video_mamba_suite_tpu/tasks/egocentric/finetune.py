"""EK100 finetune engines: MIR (retrieval) and CLS (action classification).

References:
  * /root/reference/video-mamba-suite/egocentric-understanding/engine/
    main_lavila_finetune_mir.py:112-579 — finetunes the CLIP dual encoder
    with MaxMarginRankingLoss; validation encodes the whole val set,
    all-gathers embeddings across ranks (:524-536), computes
    (sim+1)/2 similarity and mAP/nDCG against the relevancy matrix
    (:558-569).
  * engine/main_lavila_finetune_cls.py:129-618 — wraps the finetuned visual
    tower in `VideoClassifier` (avion/models/model_clip.py:19-43: dropout +
    Linear(width→num_classes), image_projection dropped), trains with
    mixup/label-smoothing CE, validates top-1/5 over multi-crop logits and
    verb/noun marginalization (avion/utils/evaluation_ek100cls.py).

TPU-native: one jitted train step over a data mesh (XLA inserts the grad
all-reduce); eval-time "all_gather of embeddings" is the single-controller
encode — jit output arrays are already global.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ...models.clip import CLIP
from ...utils.optim import make_optimizer
from ...utils.schedules import make_schedule
from ...utils.trainer import TrainerCore
from .losses import max_margin_ranking_loss
from .metrics import get_mAP, get_nDCG


class VideoClassifier(nn.Module):
    """Visual tower + dropout + linear head (model_clip.py:19-43).

    The tower must emit backbone-width features (TimeMamba output_dim=None /
    ViViM output_dim=None, num_classes=0) — the CLIP image_projection is
    dropped exactly as the reference sets `image_projection = None`.
    """

    vision_tower: nn.Module
    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, videos, deterministic: bool = True):
        feats = self.vision_tower(videos, deterministic=deterministic)
        feats = nn.Dropout(self.dropout)(feats, deterministic=deterministic)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            name="fc_cls",
        )(feats)


class MirFinetuner:
    """EK100 MIR finetune engine (main_lavila_finetune_mir.py).

    Train: CLIP fwd → normalized embeddings → MaxMarginRankingLoss on the
    global-batch similarity matrix (criterion at :158, train loop :369-460).
    Eval: `evaluate` encodes the val set and scores mAP/nDCG exactly like
    validate_mir (:488-572).
    """

    def __init__(self, model: CLIP, lr: float = 1e-5, weight_decay: float = 0.01,
                 warmup_steps: int = 100, total_steps: int = 10000,
                 margin: float = 0.2, grad_clip: float = 1.0,
                 use_mesh: bool = False, seed: int = 0):
        self.model = model
        self.margin = margin
        sched = make_schedule("cosine", lr, total_steps, warmup_steps)
        self.tx = make_optimizer("adamw", lr=sched, weight_decay=weight_decay,
                                 b2=0.98, grad_clip=grad_clip)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        model_, tx, margin_ = self.model, self.tx, margin

        @jax.jit
        def step(params, opt_state, rng, videos, texts):
            def loss_fn(p):
                img, txt, _ = model_.apply(
                    p, videos, texts, deterministic=False,
                    rngs={"dropout": rng},
                )
                # sim_matrix(text, image) — rows text, cols video (:171-175)
                sim = txt @ img.T
                return max_margin_ranking_loss(sim, margin=margin_)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def encode(params, videos, texts):
            img, txt, _ = model_.apply(params, videos, texts,
                                       deterministic=True)
            return img, txt

        self._step = step
        self._encode = encode

    def init(self, videos, texts, params=None):
        """Initialize (or adopt pretrained `params`, the resume path)."""
        if params is None:
            self.rng, k = jax.random.split(self.rng)
            params = self.model.init(
                {"params": k, "dropout": k}, videos, texts, deterministic=True
            )
        self.params = self.core.prepare(params)
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def train_step(self, videos, texts) -> float:
        if self.params is None:
            self.init(videos[:1], texts[:1])
        self.rng, k = jax.random.split(self.rng)
        videos_s, texts_s = self.core.shard((videos, texts))
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, k, videos_s, texts_s
        )
        return float(loss)

    def encode_dataset(self, videos: np.ndarray, texts: np.ndarray,
                       batch_size: int = 8) -> Tuple[np.ndarray, np.ndarray]:
        """Embed the full eval set (the gathered-embeddings equivalent of
        :524-536)."""
        vids, txts = [], []
        for i in range(0, len(videos), batch_size):
            v, t = self._encode(self.params, videos[i : i + batch_size],
                                texts[i : i + batch_size])
            vids.append(np.asarray(v))
            txts.append(np.asarray(t))
        return np.concatenate(vids, 0), np.concatenate(txts, 0)

    def evaluate(self, videos: np.ndarray, texts: np.ndarray,
                 rel_matrix: np.ndarray, batch_size: int = 8,
                 text_index: Optional[np.ndarray] = None) -> Dict[str, float]:
        """mAP/nDCG over the val set (validate_mir :558-569).

        rel_matrix: (n_videos, n_texts) relevancy (the EK100 pipeline loads
        caption_relevancy_*.pkl). `text_index` optionally reindexes text
        columns (the reference's `indexes` select of unique captions :563).
        """
        vid_emb, txt_emb = self.encode_dataset(videos, texts, batch_size)
        sim = (vid_emb @ txt_emb.T + 1) / 2
        if text_index is not None:
            sim = sim[:, text_index]
        v_map, t_map, avg_map = get_mAP(sim, rel_matrix)
        v_ndcg, t_ndcg, avg_ndcg = get_nDCG(sim, rel_matrix)
        return dict(vis_map=v_map, txt_map=t_map, avg_map=avg_map,
                    vis_ndcg=v_ndcg, txt_ndcg=t_ndcg, avg_ndcg=avg_ndcg)

    # --- checkpointing -------------------------------------------------
    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, videos, texts, step=None):
        if self.params is None:
            self.init(videos, texts)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)


class ClsFinetuner:
    """EK100 action-classification finetune engine
    (main_lavila_finetune_cls.py:129-618): VideoClassifier head on the
    (pretrained) visual tower, label-smoothing/mixup CE, multi-crop eval.
    """

    def __init__(self, vision_tower: nn.Module, num_classes: int,
                 lr: float = 1e-4, weight_decay: float = 0.05,
                 warmup_steps: int = 100, total_steps: int = 10000,
                 dropout: float = 0.5, smoothing: float = 0.1,
                 mixup_alpha: float = 0.0, cutmix_alpha: float = 0.0,
                 grad_clip: float = 1.0, use_mesh: bool = False,
                 seed: int = 0):
        self.model = VideoClassifier(vision_tower=vision_tower,
                                     num_classes=num_classes, dropout=dropout)
        self.num_classes = num_classes
        self.smoothing = smoothing
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        sched = make_schedule("cosine", lr, total_steps, warmup_steps)
        self.tx = make_optimizer("adamw", lr=sched, weight_decay=weight_decay,
                                 grad_clip=grad_clip)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        from ..recognition.augment import mixup_cutmix, one_hot_smooth
        from ..recognition.train import soft_target_cross_entropy

        model_, tx = self.model, self.tx
        n_cls, sm = num_classes, smoothing
        mx_a, cm_a = mixup_alpha, cutmix_alpha

        @jax.jit
        def step(params, opt_state, rng, videos, labels):
            k_mix, k_drop = jax.random.split(rng)
            if mx_a > 0 or cm_a > 0:
                videos, targets = mixup_cutmix(
                    k_mix, videos, labels, n_cls, mx_a, cm_a, smoothing=sm)
            else:
                targets = one_hot_smooth(labels, n_cls, sm)

            def loss_fn(p):
                logits = model_.apply(
                    p, videos, deterministic=False, rngs={"dropout": k_drop})
                return soft_target_cross_entropy(logits, targets)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def predict(params, videos):
            return jax.nn.softmax(
                model_.apply(params, videos, deterministic=True), axis=-1)

        self._step = step
        self._predict = predict

    def init(self, videos, pretrained_visual=None):
        """Init; `pretrained_visual` grafts a pretrained tower param subtree
        into the classifier (the reference's resume-checkpoint load :145-176).
        """
        self.rng, k = jax.random.split(self.rng)
        params = self.model.init(
            {"params": k, "dropout": k}, videos, deterministic=True)
        if pretrained_visual is not None:
            params = jax.tree_util.tree_map(lambda x: x, params)  # copy
            params["params"]["vision_tower"] = pretrained_visual
        self.params = self.core.prepare(params)
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def train_step(self, videos, labels) -> float:
        if self.params is None:
            self.init(videos[:1])
        self.rng, k = jax.random.split(self.rng)
        videos_s, labels_s = self.core.shard((videos, labels))
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, k, videos_s, labels_s
        )
        return float(loss)

    def evaluate(self, videos: np.ndarray, labels: np.ndarray,
                 batch_size: int = 8,
                 action_to_verb: Optional[Sequence[np.ndarray]] = None,
                 action_to_noun: Optional[Sequence[np.ndarray]] = None,
                 ) -> Dict[str, float]:
        """Top-1/5 action accuracy + optional verb/noun marginalization.

        videos may be (N, crops, T, H, W, C) for multi-crop eval — crop
        probabilities are averaged before scoring (validate :540-560,
        probs_allcrops mean). action_to_* : list mapping each verb/noun id
        to the action ids containing it (get_marginal_indexes).
        """
        multi = videos.ndim == 6
        probs = []
        flat = videos.reshape((-1,) + videos.shape[2:]) if multi else videos
        for i in range(0, len(flat), batch_size):
            probs.append(np.asarray(
                self._predict(self.params, flat[i : i + batch_size])))
        probs = np.concatenate(probs, 0)
        if multi:
            probs = probs.reshape(videos.shape[0], videos.shape[1], -1).mean(1)

        order = np.argsort(-probs, axis=1)
        top1 = float(np.mean(order[:, 0] == labels) * 100)
        top5 = float(np.mean(np.any(order[:, :5] == labels[:, None], 1)) * 100)
        out = {"action_top1": top1, "action_top5": top5}

        from .metrics import marginalize

        for name, idx_map in (("verb", action_to_verb),
                              ("noun", action_to_noun)):
            if idx_map is None:
                continue
            m_probs = marginalize(probs, idx_map)
            g_labels = np.array([
                next(g for g, acts in enumerate(idx_map)
                     if int(l) in set(np.asarray(acts).tolist()))
                for l in labels
            ])
            m_order = np.argsort(-m_probs, axis=1)
            out[f"{name}_top1"] = float(np.mean(m_order[:, 0] == g_labels) * 100)
            out[f"{name}_top5"] = float(
                np.mean(np.any(m_order[:, :5] == g_labels[:, None], 1)) * 100)
        return out

    # --- checkpointing -------------------------------------------------
    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, videos, step=None):
        if self.params is None:
            self.init(videos)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)
