"""VTG trainer + inference decode.

Reference: main/train_mr.py:31-198 (AdamW + step LR), inference decode in
main/inference_mr.py:88-170: spans = timestamp + pred_spans (normalized) ×
duration, ranked by foreground prob; saliency scores trimmed per video.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.optim import make_optimizer
from ...utils.trainer import TrainerCore
from .data import collate_vtg
from .losses import vtg_losses
from .metrics import compute_hl_ap, compute_hl_hit1, compute_mr_ap, compute_mr_r1
from .model import UniVTGMamba


TARGET_KEYS = (
    "timestamp", "timestamp_mask", "timestamp_window", "span_labels_nn",
    "saliency_scores", "saliency_pos_labels",
)


class VtgTrainer:
    def __init__(self, txt_dim: int, vid_dim: int, embed_dim: int = 256,
                 depth: int = 4, mamba_type: str = "vim", lr: float = 1e-4,
                 weight_decay: float = 1e-4, grad_clip: float = 0.1,
                 max_q_l: int = 32, max_v_l: int = 75, impl: str = "auto",
                 input_dropout: float = 0.5, seed: int = 0,
                 use_mesh: bool = False):
        self.model = UniVTGMamba(
            txt_dim=txt_dim, vid_dim=vid_dim, embed_dim=embed_dim,
            depth=depth, mamba_type=mamba_type, impl=impl,
            input_dropout=input_dropout,
        )
        self.max_q_l, self.max_v_l = max_q_l, max_v_l
        self.tx = make_optimizer("adamw", lr=lr, weight_decay=weight_decay,
                                 grad_clip=grad_clip)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.core = TrainerCore(use_mesh=use_mesh)

        model = self.model
        tx = self.tx

        @jax.jit
        def step(params, opt_state, rng, batch):
            def loss_fn(p):
                out = model.apply(
                    p, batch["src_txt"], batch["src_txt_mask"],
                    batch["src_vid"], batch["src_vid_mask"],
                    deterministic=False, rngs={"dropout": rng},
                )
                targets = {k: batch[k] for k in TARGET_KEYS}
                losses = vtg_losses(out, targets)
                return losses["loss_total"], losses

            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, losses

        @jax.jit
        def fwd(params, batch):
            return model.apply(
                params, batch["src_txt"], batch["src_txt_mask"],
                batch["src_vid"], batch["src_vid_mask"], deterministic=True,
            )

        self._step = step
        self._fwd = fwd

    def init(self, batch):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.model.init(
            {"params": k, "dropout": k},
            batch["src_txt"], batch["src_txt_mask"],
            batch["src_vid"], batch["src_vid_mask"], deterministic=True,
        )
        self.params = self.core.prepare(self.params)
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        """Checkpoint (reference --resume contract, main/train_mr.py)."""
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, batch, step=None):
        if self.params is None:
            self.init(batch)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)

    def train_epoch(self, samples: List[dict], batch_size: int = 4) -> Dict:
        # epoch-seeded per-process order (DistributedSampler semantics)
        from ...data.sampler import sharded_epoch_order

        self._epoch = getattr(self, "_epoch", -1) + 1
        order = sharded_epoch_order(len(samples), self._epoch)
        agg, nb = {}, 0
        for i in range(0, len(samples), batch_size):
            chunk = [samples[j] for j in order[i : i + batch_size]]
            if len(chunk) < 2:
                continue
            batch = collate_vtg(chunk, self.max_q_l, self.max_v_l)
            if self.params is None:
                self.init(batch)
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, losses = self._step(
                self.params, self.opt_state, k, self.core.shard(batch)
            )
            for k_, v in jax.device_get(losses).items():
                agg[k_] = agg.get(k_, 0.0) + float(v)
            nb += 1
        return {k_: v / max(nb, 1) for k_, v in agg.items()}

    def predict(self, samples: List[dict], topk: int = 10) -> List[dict]:
        """Decode ranked spans in seconds (inference_mr.py:88-170)."""
        submission = []
        for i in range(0, len(samples), 8):
            chunk = samples[i : i + 8]
            batch = collate_vtg(chunk, self.max_q_l, self.max_v_l)
            out = self._fwd(self.params, batch)
            spans = np.asarray(batch["timestamp"] + np.asarray(out["pred_spans"]))
            prob = np.asarray(out["pred_logits"][..., 0])
            sal = np.asarray(out["saliency_scores"])
            for j, s in enumerate(chunk):
                dur = s["duration"]
                lv = min(len(s["vid_feat"]), self.max_v_l)
                sp = np.clip(spans[j, :lv] * dur, 0, dur)
                pr = prob[j, :lv]
                order = np.argsort(-pr)[:topk]
                windows = [[float(sp[k_, 0]), float(sp[k_, 1]), float(pr[k_])]
                           for k_ in order]
                submission.append(dict(
                    qid=s["qid"], pred_relevant_windows=windows,
                    pred_saliency_scores=sal[j, :lv].tolist(),
                ))
        return submission

    def evaluate(self, samples: List[dict]) -> Dict:
        submission = self.predict(samples)
        gt = [dict(qid=s["qid"], relevant_windows=s["relevant_windows"])
              for s in samples]
        mr_ap = compute_mr_ap(submission, gt)
        r1, miou = compute_mr_r1(submission, gt)
        out = {"mAP_avg": mr_ap["average"], "mIoU@1": miou}
        for t in ("0.5", "0.7"):
            if t in r1:
                out[f"R1@{t}"] = r1[t]
        # highlight detection against binary window indicator
        qid2preds = {s2["qid"]: s2 for s2 in submission}
        qid2gt = {}
        for s in samples:
            lv = min(len(s["vid_feat"]), self.max_v_l)
            binary = s["targets"]["timestamp_window"][:lv][:, None]
            qid2gt[s["qid"]] = binary
        out["HL_hit1"] = compute_hl_hit1(qid2preds, qid2gt)
        out["HL_mAP"] = compute_hl_ap(qid2preds, qid2gt)
        return out
