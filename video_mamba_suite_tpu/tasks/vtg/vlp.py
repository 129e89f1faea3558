"""VLP (video-language pretraining) for UniVTG-Mamba.

Reference: /root/reference/video-mamba-suite/video-temporal-grounding/
main/train_vlp.py:31-278 + main/dataset.py DatasetVLP (:24-330): the MR
model + SetCriterion trained over mixed point / interval / curve
grounding data (Ego4D point_egoclip, VideoCC interval, curve saliency),
with class-name tokens (`src_cls`) threaded through for TAL-style zero-shot
scoring. The per-type `weight_ablation` vector is produced by the dataset
(:240-247) but never consumed by the criterion in the snapshot — recorded
here for parity and likewise unused.

TPU-native: the trainer is the shared jitted MR step (VtgTrainer) run over
VLP-schema samples; zero-shot class scoring pools class-token features with
the same text projector/pool (model.src_cls path).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .data import build_targets
from .train import VtgTrainer


def build_vlp_sample(ctx_l: int, vid_dim: int, txt_dim: int, q_l: int,
                     sample_type: str, rng: np.random.Generator,
                     clip_len: float = 1.0) -> dict:
    """One VLP sample in the MR schema, per DatasetVLP's type branches:
      * 'point'    — a single timestamp widened to one clip (dataset.py
                     :171-177 minimum-width fix);
      * 'interval' — an MR-style relevant window;
      * 'curve'    — a continuous saliency curve; windows from its support.
    """
    vid = rng.standard_normal((ctx_l, vid_dim)).astype(np.float32)
    txt = rng.standard_normal((q_l, txt_dim)).astype(np.float32)
    duration = ctx_l * clip_len
    sal = None
    if sample_type == "point":
        t = float(rng.uniform(0, duration - clip_len))
        center = t + clip_len / 2
        windows = [[max(0.0, center - 0.5 * clip_len),
                    min(duration, center + 0.5 * clip_len)]]
        ablation = [0, 0, 1, 0, 0]
    elif sample_type == "interval":
        s = float(rng.uniform(0, duration * 0.6))
        e = float(rng.uniform(s + clip_len, min(duration, s + duration * 0.4)))
        windows = [[s, e]]
        ablation = [1, 1, 0, 0, 0]
    elif sample_type == "curve":
        sal = np.clip(rng.standard_normal(ctx_l) * 0.3 + 0.3, 0, 1)
        thr = sal > 0.5
        if not thr.any():
            thr[int(rng.integers(ctx_l))] = True
        idx = np.nonzero(thr)[0]
        windows = [[float(idx[0]) * clip_len, float(idx[-1] + 1) * clip_len]]
        sal = sal.astype(np.float32)
        ablation = [0, 0, 0, 1, 1]
    else:
        raise ValueError(sample_type)

    targets = build_targets(ctx_l, windows, clip_len,
                            saliency_scores=sal, rng=rng)
    return dict(
        qid=int(rng.integers(1 << 30)), vid_feat=vid, txt_feat=txt,
        duration=duration, relevant_windows=windows, targets=targets,
        type=sample_type, weight_ablation=np.asarray(ablation, np.float32),
    )


def make_synthetic_vlp(num_samples: int = 9, ctx_l: int = 32,
                       vid_dim: int = 12, txt_dim: int = 12, q_l: int = 4,
                       seed: int = 0,
                       types=("point", "interval", "curve")) -> List[dict]:
    rng = np.random.default_rng(seed)
    return [
        build_vlp_sample(ctx_l, vid_dim, txt_dim, q_l,
                         types[i % len(types)], rng)
        for i in range(num_samples)
    ]


class VlpPretrainer(VtgTrainer):
    """VLP pretraining = the MR trainer over VLP-schema data
    (train_vlp.py trains the identical model/criterion; only the dataset
    and the optional src_cls zero-shot inputs differ)."""

    def zero_shot_class_scores(self, samples: List[dict],
                               cls_feats: np.ndarray,
                               cls_mask: Optional[np.ndarray] = None
                               ) -> np.ndarray:
        """Cosine scores of each video clip against pooled class-name
        embeddings (the zero-shot TAL scoring the cls path enables;
        train_vlp.py:115-120, univtg_mamba.py:382-384).

        cls_feats: (C, Lc, Dt) class-name token features. Returns
        (B, Lv, C) clip-vs-class similarities.
        """
        import jax.numpy as jnp

        from .data import collate_vtg

        batch = collate_vtg(samples, self.max_q_l, self.max_v_l)
        if cls_mask is None:
            cls_mask = np.ones(cls_feats.shape[:2], np.float32)
        out = self.model.apply(
            self.params, batch["src_txt"], batch["src_txt_mask"],
            batch["src_vid"], batch["src_vid_mask"],
            src_cls=jnp.asarray(cls_feats), src_cls_mask=jnp.asarray(cls_mask),
            deterministic=True,
        )
        vid = np.asarray(out["vid_mem_proj"], np.float32)    # (B, Lv, D)
        cls = np.asarray(out["cls_mem_proj"], np.float32)    # (C, D)
        vidn = vid / np.maximum(
            np.linalg.norm(vid, axis=-1, keepdims=True), 1e-8)
        clsn = cls / np.maximum(
            np.linalg.norm(cls, axis=-1, keepdims=True), 1e-8)
        return np.einsum("bld,cd->blc", vidn, clsn)
