"""Query-focused video summarization (QFVS) on the UniVTG-Mamba model.

Reference: /root/reference/video-mamba-suite/video-temporal-grounding/
main/train_qfvs.py:33-325 (three-forward concept gather training + top-p%
shot selection eval), main/dataset_qfvs.py (segmented UT-Ego features +
concept-pair queries + oracle summary labels), eval/qfvs.py:27-75
(semantic-IoU max-weight bipartite matching P/R/F1 against Tags.mat
concept annotations).

TPU-native: the per-segment (max_segment_num × max_frame_num) layout is
flattened to one (B, S·F) sequence per forward with a validity mask; the
three concept forwards (concept1 / concept2 / oracle) run inside ONE jitted
step and their losses are summed when qfvs_loss_gather is on (train_qfvs.py
:183-195). Max-weight matching uses scipy linear_sum_assignment (weights
are non-negative semantic IoUs, so the rectangular assignment optimum
equals networkx max_weight_matching).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.optim import make_optimizer
from ...utils.trainer import TrainerCore
from .model import UniVTGMamba


# --- metric (eval/qfvs.py) -------------------------------------------------


def semantic_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of binary concept-tag vectors (eval/qfvs.py:32-40)."""
    inter = float(np.sum(a * b))
    union = float(np.sum((a + b) > 0))
    return inter / union if union else 0.0


def calculate_semantic_matching(machine_summary: Sequence[int],
                                gt_summary: Sequence[int],
                                shots_tag: np.ndarray):
    """P/R/F1 via max-weight bipartite matching of shot concept-tags
    (eval/qfvs.py:57-75). shots_tag: (n_shots, n_concepts) binary."""
    from scipy.optimize import linear_sum_assignment

    m_mat = shots_tag[np.asarray(machine_summary, int)]
    g_mat = shots_tag[np.asarray(gt_summary, int)]
    w = np.zeros((len(m_mat), len(g_mat)))
    for i in range(len(m_mat)):
        for j in range(len(g_mat)):
            w[i, j] = semantic_iou(m_mat[i], g_mat[j])
    ri, ci = linear_sum_assignment(-w)
    total = float(w[ri, ci].sum())
    precision = total / max(len(m_mat), 1)
    recall = total / max(len(g_mat), 1)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return precision, recall, f1


# --- losses ----------------------------------------------------------------


def qfvs_losses(out: Dict[str, jax.Array], gt: jax.Array, mask: jax.Array,
                f_loss_coef: float = 1.0, s_loss_intra_coef: float = 0.1,
                margin: float = 0.2) -> Dict[str, jax.Array]:
    """Frame-classification + intra-video saliency rank losses.

    gt/mask: (B, L) binary summary labels / validity. loss_f = masked BCE on
    pred_logits (the criterion's label loss applied per frame); loss_s_intra
    = margin ranking of saliency scores, positive frames over negative
    (SetCriterion saliency losses, univtg_mamba.py:500-560, as wired by
    f_loss_coef / s_loss_intra_coef in train_qfvs.py:104-106)."""
    logits = out["pred_logits"][..., 0].astype(jnp.float32)
    m = mask.astype(jnp.float32)
    gtf = gt.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(logits, gtf)
    loss_f = jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)

    sal = out["saliency_scores"].astype(jnp.float32)
    pos = gtf * m
    neg = (1.0 - gtf) * m
    pos_mean = jnp.sum(sal * pos, -1) / jnp.maximum(jnp.sum(pos, -1), 1.0)
    neg_mean = jnp.sum(sal * neg, -1) / jnp.maximum(jnp.sum(neg, -1), 1.0)
    loss_s = jnp.mean(jnp.maximum(0.0, margin - pos_mean + neg_mean))

    total = f_loss_coef * loss_f + s_loss_intra_coef * loss_s
    return dict(loss_f=loss_f, loss_s_intra=loss_s, loss_total=total)


# --- synthetic data (the dataset_qfvs.py contract on random tensors) -------


def make_synthetic_qfvs(num_items: int = 4, n_segments: int = 3,
                        n_frames: int = 8, vid_dim: int = 12,
                        txt_dim: int = 12, n_concepts: int = 6, seed: int = 0):
    """Items shaped like dataset_qfvs.py's: segmented features, two concept
    embeddings, per-frame oracle summary labels, segment lengths."""
    rng = np.random.default_rng(seed)
    items = []
    for _ in range(num_items):
        seg_len = rng.integers(n_frames // 2, n_frames + 1, n_segments)
        feats = rng.standard_normal(
            (n_segments, n_frames, vid_dim)).astype(np.float32)
        c1 = rng.standard_normal((txt_dim,)).astype(np.float32)
        c2 = rng.standard_normal((txt_dim,)).astype(np.float32)
        gt = np.zeros((n_segments, n_frames), np.float32)
        for s in range(n_segments):
            k = max(1, int(seg_len[s]) // 3)
            gt[s, rng.choice(seg_len[s], k, replace=False)] = 1.0
        items.append(dict(features=feats, seg_len=seg_len,
                          concept1=c1, concept2=c2, gt_summary=gt))
    shots_tag = (rng.random((n_segments * n_frames * 2, n_concepts))
                 > 0.6).astype(np.float64)
    return items, shots_tag


def collate_qfvs(items: List[dict]):
    """Flatten segments → (B, S·F) sequences + masks (the TPU equivalent of
    start_end_collate_qfvs / prepare_batch_inputs_qfvs)."""
    feats = np.stack([it["features"] for it in items])       # (B,S,F,D)
    B, S, F, D = feats.shape
    mask = np.zeros((B, S, F), np.float32)
    for b, it in enumerate(items):
        for s, sl in enumerate(it["seg_len"]):
            mask[b, s, :sl] = 1.0
    gt = np.stack([it["gt_summary"] for it in items])
    c1 = np.stack([it["concept1"] for it in items])[:, None]  # (B,1,Dt)
    c2 = np.stack([it["concept2"] for it in items])[:, None]
    return (feats.reshape(B, S * F, D), mask.reshape(B, S * F),
            gt.reshape(B, S * F), c1, c2)


class QfvsTrainer:
    """Three-forward QFVS trainer (train_qfvs.py:159-208) + top-p% eval."""

    def __init__(self, txt_dim: int, vid_dim: int, embed_dim: int = 32,
                 depth: int = 2, lr: float = 1e-4, weight_decay: float = 1e-4,
                 f_loss_coef: float = 1.0, s_loss_intra_coef: float = 0.1,
                 loss_gather: bool = True, score_gather: bool = True,
                 top_percent: float = 0.15, impl: str = "auto",
                 use_mesh: bool = False, seed: int = 0):
        self.model = UniVTGMamba(txt_dim=txt_dim, vid_dim=vid_dim,
                                 embed_dim=embed_dim, depth=depth,
                                 impl=impl, input_dropout=0.0)
        self.top_percent = top_percent
        self.score_gather = score_gather
        self.tx = make_optimizer("adamw", lr=lr, weight_decay=weight_decay)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        model, tx = self.model, self.tx
        fc, sc, gather = f_loss_coef, s_loss_intra_coef, loss_gather

        def fwd(p, vid, vmask, txt, rng):
            tmask = jnp.ones(txt.shape[:2], jnp.float32)
            return model.apply(p, txt, tmask, vid, vmask,
                               deterministic=False, rngs={"dropout": rng})

        @jax.jit
        def step(params, opt_state, rng, vid, vmask, gt, c1, c2):
            oracle = jnp.concatenate([c1, c2], axis=1)

            def loss_fn(p):
                ks = jax.random.split(rng, 3)
                l1 = qfvs_losses(fwd(p, vid, vmask, c1, ks[0]), gt, vmask,
                                 fc, sc)
                l2 = qfvs_losses(fwd(p, vid, vmask, c2, ks[1]), gt, vmask,
                                 fc, sc)
                lo = qfvs_losses(fwd(p, vid, vmask, oracle, ks[2]), gt,
                                 vmask, fc, sc)
                total = (l1["loss_total"] + l2["loss_total"] + lo["loss_total"]
                         if gather else lo["loss_total"])
                return total, dict(loss_total=total, loss_f=lo["loss_f"],
                                   loss_s_intra=lo["loss_s_intra"])

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, losses

        @jax.jit
        def scores(params, vid, vmask, txt):
            tmask = jnp.ones(txt.shape[:2], jnp.float32)
            out = model.apply(params, txt, tmask, vid, vmask,
                              deterministic=True)
            return out["pred_logits"][..., 0], out["saliency_scores"]

        self._step = step
        self._scores = scores

    def init(self, vid, vmask, c1):
        self.rng, k = jax.random.split(self.rng)
        tmask = jnp.ones(c1.shape[:2], jnp.float32)
        self.params = self.core.prepare(self.model.init(
            {"params": k, "dropout": k}, c1, tmask, vid, vmask,
            deterministic=True))
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def train_step(self, vid, vmask, gt, c1, c2) -> Dict[str, float]:
        if self.params is None:
            self.init(vid, vmask, c1)
        self.rng, k = jax.random.split(self.rng)
        vid, vmask, gt, c1, c2 = self.core.shard((vid, vmask, gt, c1, c2))
        self.params, self.opt_state, losses = self._step(
            self.params, self.opt_state, k, vid, vmask, gt, c1, c2)
        # ONE device_get for the whole dict: per-leaf float() costs a
        # device round-trip each (tens of ms over the tunneled chip)
        return {k_: float(v) for k_, v in
                jax.device_get(losses).items()}

    def predict_summary(self, vid, vmask, c1, c2) -> List[np.ndarray]:
        """Top-p% frame indices per video, score-ensembled over the three
        concept forwards (eval_epoch :104-141)."""
        oracle = np.concatenate([c1, c2], axis=1)
        logit_o, sal_o = self._scores(self.params, vid, vmask, oracle)
        score = np.asarray(logit_o) + np.asarray(sal_o)
        if self.score_gather:
            for cc in (c1, c2):
                lg, sl = self._scores(self.params, vid, vmask, cc)
                score = score + np.asarray(lg) + np.asarray(sl)
        picks = []
        for b in range(score.shape[0]):
            valid = np.asarray(vmask[b]) > 0
            n_valid = int(valid.sum())
            k = max(1, int(n_valid * self.top_percent))
            s = np.where(valid, score[b], -np.inf)
            picks.append(np.argsort(-s)[:k])
        return picks

    def evaluate(self, items: List[dict], shots_tag: np.ndarray
                 ) -> Dict[str, float]:
        vid, vmask, gt, c1, c2 = collate_qfvs(items)
        picks = self.predict_summary(vid, vmask, c1, c2)
        p_sum = r_sum = f_sum = 0.0
        for b, it in enumerate(items):
            gt_idx = np.nonzero(gt[b] > 0)[0]
            p, r, f1 = calculate_semantic_matching(
                picks[b].tolist(), gt_idx.tolist(), shots_tag)
            p_sum, r_sum, f_sum = p_sum + p, r_sum + r, f_sum + f1
        n = max(len(items), 1)
        return {"P": 100 * p_sum / n, "R": 100 * r_sum / n,
                "F": 100 * f_sum / n}

    # --- checkpointing ---------------------------------------------------
    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        self.core.save(directory, step, self.state_dict())
