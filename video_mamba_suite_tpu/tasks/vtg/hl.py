"""Highlight-detection (TVSum / YouTube-HL) training + eval path.

Capability match for /root/reference/video-mamba-suite/
video-temporal-grounding/main/train_hl.py + config_hl.py + DatasetHL
(main/dataset.py:722-930): per-domain train/val splits, saliency-only
supervision (the MR span losses have no targets here), and the TVSum
protocol's top-5 mAP averaged over the 20 annotators (dataset.py:900-930).

The model is the same UniVTGMamba; when a sample has no query feature the
trainer feeds a single zero text token (the reference's DatasetHL allows a
missing q_feat_dir the same way).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.optim import make_optimizer
from ...utils.trainer import TrainerCore
from .model import UniVTGMamba

# Per-domain train/val video ids (config_hl.py:149-210 — dataset metadata,
# reproduced for split-exact reproduction).
TVSUM_SPLITS = {
    "BK": {"train": ["WxtbjNsCQ8A", "EE-bNr36nyA", "oDXZc0tZe04",
                     "uGu_10sucQo"], "val": ["Se3oxnaPsz0"]},
    "BT": {"train": ["eQu1rNs0an0", "qqR6AEXwxoQ", "EYqVtI9YWJA",
                     "iVt07TCkFM0"], "val": ["JgHubY5Vw3Y"]},
    "DS": {"train": ["kLxoNp-UchI", "NyBmCxDoHJU", "jcoYJXDG9sw",
                     "-esJrBWj2d8"], "val": ["E11zDS9XGzg"]},
    "FM": {"train": ["_xMr-HKMfVA", "byxOvuiIJV0", "VuWGsYPqAX8",
                     "JKpqYvAdIsw"], "val": ["xmEERLqJ2kU"]},
    "GA": {"train": ["xxdtq8mxegs", "i3wAGJaaktw", "0tmA_C6XwfM",
                     "3eYKfiOEJNs"], "val": ["Bhxk-O1Y7Ho"]},
    "MS": {"train": ["Hl-__g2gn_A", "WG0MBPpPC6I", "LRw_obCPUt0",
                     "37rzWOQsNIw"], "val": ["Yi4Ij2NM7U4"]},
    "PK": {"train": ["GsAD1KT1xo8", "XkqCExn6_Us", "b626MiF1ew4",
                     "PJrm840pAUI"], "val": ["cjibtmSLxQ4"]},
    "PR": {"train": ["RBCABdttQmI", "z_6gVvQb2d0", "4wU_LUjG5Ic",
                     "91IHQYk1IQM"], "val": ["fWutDQy1nnY"]},
    "VT": {"train": ["gzDbaEs1Rlg", "XzYM3PfTM4w", "98MoyGZKHXc",
                     "AwmHb44_ouw"], "val": ["J0nA4VgnoCo"]},
    "VU": {"train": ["akI8YFjEmUw", "HT5vyqe0Xaw", "vdmoEJ5YbrQ",
                     "xwqBXPGE9pQ"], "val": ["sTEELN-vY30"]},
}


def hl_losses(outputs: Dict, targets: Dict, eos_coef: float = 0.1,
              temperature: float = 0.07,
              weights: Optional[Dict[str, float]] = None) -> Dict:
    """Saliency-only objective (train_hl.py criterion with no span targets):
    loss_f — foreground BCE against the binarized (> per-video median)
    saliency; loss_s_intra — within-video InfoNCE ranking the annotated
    peak clip above lower-scored clips. Weights default to the reference
    config.py:74-84 HL coefs (f=4, s_intra=0.1)."""
    weights = weights or dict(loss_f=4.0, loss_s_intra=0.1)
    out: Dict[str, jax.Array] = {}
    mask = targets["vid_mask"].astype(jnp.float32)              # (B, Lv)
    sal = targets["saliency_scores"].astype(jnp.float32)        # (B, Lv)

    # foreground = clips above the per-video median saliency (the TVSum
    # binarization, dataset.py:907)
    med = jnp.median(jnp.where(mask > 0, sal, jnp.nan), axis=1,
                     keepdims=True)
    med = jnp.nan_to_num(med)
    tgt = (sal > med).astype(jnp.float32) * mask
    probs = jnp.clip(outputs["pred_logits"][..., 0].astype(jnp.float32),
                     1e-6, 1 - 1e-6)
    w = jnp.where(tgt > 0, 1.0, eos_coef) * mask
    bce = -(tgt * jnp.log(probs) + (1 - tgt) * jnp.log(1 - probs)) * w
    out["loss_f"] = jnp.sum(bce) / jnp.maximum(jnp.sum(mask), 1.0)

    # intra-video saliency InfoNCE (losses.py loss_s_intra with the HL
    # dataset's sampled positive clip)
    vid_mem = outputs["vid_mem_proj"].astype(jnp.float32)       # (B, Lv, D)
    txt = outputs["txt_mem_proj"][:, 0].astype(jnp.float32)     # (B, D)
    pos_idx = targets["saliency_pos_labels"].astype(jnp.int32)  # (B,)
    B = vid_mem.shape[0]
    bidx = jnp.arange(B)

    def norm(x):
        return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-8)

    sim = jnp.sum(norm(vid_mem) * norm(txt)[:, None], axis=-1)  # (B, Lv)
    sel = sal[bidx, pos_idx][:, None]
    neg_in = (sal < sel).at[bidx, pos_idx].set(True)
    sim = sim + jnp.where(neg_in & (mask > 0), 0.0, -1e4)
    logsm = jax.nn.log_softmax(sim / temperature, axis=1)
    out["loss_s_intra"] = -jnp.mean(logsm[bidx, pos_idx])

    out["loss_total"] = sum(out[k] * weights.get(k, 1.0) for k in list(out))
    return out


def collate_hl(samples: List[dict], max_v_l: int, txt_dim: int):
    """samples: [{vid_feat (T, D), saliency (T,), txt_feat (Lq, Dt)?}] →
    padded batch arrays. Saliency padding = -1 (never selected)."""
    B = len(samples)
    vid_dim = samples[0]["vid_feat"].shape[-1]
    src_vid = np.zeros((B, max_v_l, vid_dim), np.float32)
    vid_mask = np.zeros((B, max_v_l), np.float32)
    sal = np.full((B, max_v_l), -1.0, np.float32)
    src_txt = np.zeros((B, 1, txt_dim), np.float32)
    txt_mask = np.ones((B, 1), np.float32)
    pos = np.zeros((B,), np.int32)
    rng = np.random.default_rng(0)
    for i, s in enumerate(samples):
        T = min(len(s["vid_feat"]), max_v_l)
        src_vid[i, :T] = s["vid_feat"][:T]
        vid_mask[i, :T] = 1.0
        sal[i, :T] = s["saliency"][:T]
        if s.get("txt_feat") is not None:
            src_txt[i, 0] = s["txt_feat"][:1]
        cand = np.where(s["saliency"][:T] > 0)[0]
        pos[i] = int(rng.choice(cand)) if len(cand) else 0
    return dict(src_txt=src_txt, src_txt_mask=txt_mask, src_vid=src_vid,
                src_vid_mask=vid_mask, saliency_scores=sal,
                saliency_pos_labels=pos, vid_mask=vid_mask)


class HlTrainer:
    """train_hl.py loop over one domain: saliency-only optimization, eval
    with pred_cls = saliency_scores + pred_logits ('add' eval_mode,
    train_hl.py:53-61)."""

    def __init__(self, txt_dim: int, vid_dim: int, embed_dim: int = 256,
                 depth: int = 4, mamba_type: str = "vim", lr: float = 1e-4,
                 weight_decay: float = 1e-4, grad_clip: float = 0.1,
                 max_v_l: int = 512, impl: str = "auto", seed: int = 0,
                 use_mesh: bool = False, eval_mode: str = "add"):
        self.model = UniVTGMamba(txt_dim=txt_dim, vid_dim=vid_dim,
                                 embed_dim=embed_dim, depth=depth,
                                 mamba_type=mamba_type, impl=impl)
        self.txt_dim = txt_dim
        self.max_v_l = max_v_l
        self.eval_mode = eval_mode
        self.tx = make_optimizer("adamw", lr=lr, weight_decay=weight_decay,
                                 grad_clip=grad_clip)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        model, tx = self.model, self.tx

        @jax.jit
        def step(params, opt_state, rng, batch):
            def loss_fn(p):
                out = model.apply(
                    p, batch["src_txt"], batch["src_txt_mask"],
                    batch["src_vid"], batch["src_vid_mask"],
                    deterministic=False, rngs={"dropout": rng},
                )
                losses = hl_losses(out, batch)
                return losses["loss_total"], losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, losses

        @jax.jit
        def fwd(params, batch):
            return model.apply(
                params, batch["src_txt"], batch["src_txt_mask"],
                batch["src_vid"], batch["src_vid_mask"], deterministic=True)

        self._step = step
        self._fwd = fwd

    def init(self, batch):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(
            {"params": k, "dropout": k}, batch["src_txt"],
            batch["src_txt_mask"], batch["src_vid"], batch["src_vid_mask"],
            deterministic=True)
        self.params = self.core.prepare(self.params)
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def train_epoch(self, samples: List[dict], batch_size: int = 4) -> Dict:
        # epoch-seeded per-process order (DistributedSampler semantics)
        from ...data.sampler import sharded_epoch_order

        self._epoch = getattr(self, "_epoch", -1) + 1
        order = sharded_epoch_order(len(samples), self._epoch)
        losses = {}
        for i in range(0, len(samples), batch_size):
            batch = collate_hl([samples[j] for j in order[i:i + batch_size]],
                               self.max_v_l, self.txt_dim)
            if self.params is None:
                self.init(batch)
            batch = self.core.shard(batch)
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, losses = self._step(
                self.params, self.opt_state, k, batch)
        # ONE device_get for the whole dict: per-leaf float() costs a
        # device round-trip each (tens of ms over the tunneled chip)
        return {k_: float(v) for k_, v in
                jax.device_get(losses).items()}

    def state_dict(self) -> Dict:
        return {"params": self.params, "opt_state": self.opt_state}

    def save(self, directory: str, step: int):
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, samples: List[dict], step=None):
        """Restore latest (or given) step; samples initialize shapes."""
        if self.params is None:
            self.init(collate_hl(samples[:1], self.max_v_l, self.txt_dim))
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.params = state["params"]
            self.opt_state = state["opt_state"]

    def predict_scores(self, samples: List[dict]) -> List[np.ndarray]:
        """Per-video clip scores (eval_mode 'add': saliency + fg logit)."""
        outs = []
        for s in samples:
            batch = collate_hl([s], self.max_v_l, self.txt_dim)
            out = self._fwd(self.params, batch)
            T = min(len(s["vid_feat"]), self.max_v_l)
            sal = np.asarray(out["saliency_scores"])[0][:T]
            logit = np.asarray(out["pred_logits"][..., 0])[0][:T]
            outs.append(sal + logit if self.eval_mode == "add" else logit)
        return outs


def tvsum_map_at_k(scores: List[np.ndarray], annos: List[np.ndarray],
                   k: int = 5) -> float:
    """TVSum protocol (dataset.py:900-930): for each of the annotators,
    binarize each video's per-clip labels at > median, rank clips by the
    predicted score, and compute AP over the top-k; average over videos,
    then annotators. annos[i]: (T_i, n_annotators)."""
    n_ann = annos[0].shape[1]
    maps = []
    for a in range(n_ann):
        aps = []
        for score, anno in zip(scores, annos):
            lab = anno[:, a].astype(np.float32)
            lab = (lab > np.median(lab)).astype(np.float32)
            order = np.argsort(-score)
            top = lab[order][:k]
            num_gt = top.sum()
            if num_gt == 0:
                aps.append(0.0)
                continue
            hits = ap = rec = 0.0
            prc = 1.0
            for j, g in enumerate(top):
                hits += g
                _rec = hits / num_gt
                _prc = hits / (j + 1)
                ap += (_rec - rec) * (prc + _prc) / 2
                rec, prc = _rec, _prc
            aps.append(ap)
        maps.append(float(np.mean(aps)))
    return float(np.mean(maps))
