"""TAL trainer: AdamW + warmup-cosine + EMA + grad clip, jitted step.

Reference: train_eval.py + libs/utils/train_utils.py (make_optimizer :63,
make_scheduler :129, ModelEma :229, train_one_epoch :255 with
clip_grad_l2norm). The loss normalizer EMA (meta_archs.py:583-588) is carried
in the train state as a scalar so the whole step stays jitted.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.ema import EmaState, ema_init, ema_update
from ...utils.optim import make_optimizer
from ...utils.schedules import make_schedule
from ...utils.trainer import TrainerCore
from .data import collate_tal
from .metrics import ANETdetection
from .model import ActionMambaDetector, decode_single_video, label_points, tal_losses
from .nms import batched_nms


def fuse_external_scores(segs, scores, ext_scores, topk_per_prop: int = 2,
                         max_out: int = 200):
    """External classification-score fusion (the THUMOS `ext_score_file`
    mode, configs/mamba_thumos_new.yaml:44-50 + postprocessing.py): the model
    provides class-agnostic proposals; video-level classifier scores provide
    labels. Each proposal expands into its top classes with
    score = sqrt(prop_score · cls_score)."""
    import numpy as np

    ext = np.asarray(ext_scores, np.float64)
    top_cls = np.argsort(-ext)[:topk_per_prop]
    out_segs, out_scores, out_labels = [], [], []
    for seg, sc in zip(np.asarray(segs), np.asarray(scores)):
        for c in top_cls:
            out_segs.append(seg)
            out_scores.append(float(np.sqrt(max(sc, 0) * ext[c])))
            out_labels.append(int(c))
    order = np.argsort(-np.asarray(out_scores))[:max_out]
    return (np.asarray(out_segs)[order], np.asarray(out_scores)[order],
            np.asarray(out_labels)[order])


class TalTrainer:
    def __init__(
        self,
        input_dim: int,
        num_classes: int,
        max_seq_len: int = 2304,
        embd_dim: int = 512,
        regression_range=None,
        backbone_arch=(2, 2, 5),
        lr: float = 1e-4,
        weight_decay: float = 0.05,
        warmup_steps: int = 100,
        total_steps: int = 10000,
        grad_clip: float = 1.0,
        ema_decay: float = 0.999,
        label_smoothing: float = 0.0,
        init_loss_norm: float = 100.0,
        center_sample_radius: float = 1.5,
        mixer: str = "dbm",
        impl: str = "auto",
        max_num_gt: int = 32,
        seed: int = 0,
        test_cfg: Optional[dict] = None,
        use_mesh: bool = False,
    ):
        kwargs = dict(
            input_dim=input_dim, num_classes=num_classes,
            max_seq_len=max_seq_len, embd_dim=embd_dim, fpn_dim=embd_dim,
            head_dim=embd_dim, backbone_arch=tuple(backbone_arch),
            mixer=mixer, impl=impl,
        )
        if regression_range is not None:
            kwargs["regression_range"] = tuple(map(tuple, regression_range))
        self.model = ActionMambaDetector(**kwargs)
        self.num_classes = num_classes
        self.max_seq_len = max_seq_len
        self.max_num_gt = max_num_gt
        self.ema_decay = ema_decay
        self.label_smoothing = label_smoothing
        self.center_sample_radius = center_sample_radius
        self.point_gen = self.model.make_points()
        self.rng = jax.random.PRNGKey(seed)
        self.test_cfg = dict(
            pre_nms_thresh=0.001, pre_nms_topk=2000, iou_threshold=0.1,
            min_score=0.001, max_seg_num=200, nms_method="soft",
            duration_thresh=0.05, multiclass_nms=True, nms_sigma=0.5,
            voting_thresh=0.7,
        )
        if test_cfg:
            self.test_cfg.update(test_cfg)

        sched = make_schedule("cosine", lr, total_steps, warmup_steps)
        self.tx = make_optimizer(
            "adamw", lr=sched, weight_decay=weight_decay, grad_clip=grad_clip
        )
        self.params = None
        self.opt_state = None
        self.ema: Optional[EmaState] = None
        self.loss_norm = jnp.asarray(init_loss_norm, jnp.float32)
        self._step_fn = None
        self._fwd_fn = None
        self.core = TrainerCore(use_mesh=use_mesh)

    def _level_lengths(self, T: int) -> List[int]:
        ls = [T]
        for _ in range(self.model.backbone_arch[2]):
            ls.append(-(-ls[-1] // self.model.scale_factor))
        return ls

    def init(self, feats, mask):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.core.prepare(self.model.init(
            {"params": k, "dropout": k}, feats, mask, deterministic=True
        ))
        self.opt_state = self.core.prepare(self.tx.init(self.params))
        self.ema = ema_init(self.params, self.ema_decay)

        points_np = self.point_gen(self._level_lengths(feats.shape[1]))
        points_cat = jnp.concatenate(points_np, axis=0)
        model = self.model
        num_classes = self.num_classes
        label_smoothing = self.label_smoothing
        radius = self.center_sample_radius
        tx = self.tx

        @jax.jit
        def step(params, opt_state, loss_norm, ema, rng,
                 feats, mask, segs, labels, valid):
            gt_cls, gt_off = label_points(
                points_cat, segs, labels, valid, num_classes,
                center_sample_radius=radius,
            )

            def loss_fn(p):
                cls_logits, offsets, fpn_masks = model.apply(
                    p, feats, mask, deterministic=False, rngs={"dropout": rng}
                )
                fpn_masks = [m for m in fpn_masks]
                losses, new_norm = tal_losses(
                    fpn_masks, cls_logits, offsets, gt_cls, gt_off,
                    loss_norm, num_classes, label_smoothing,
                )
                return losses["final_loss"], (losses, new_norm)

            (loss, (losses, new_norm)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # EMA folded into the jitted step: a separate dispatch costs a
            # full host round-trip per step on the tunneled chip
            ema = ema_update(ema, params)
            return params, opt_state, new_norm, ema, losses

        @jax.jit
        def fwd(params, feats, mask):
            return model.apply(params, feats, mask, deterministic=True)

        self._step_fn = step
        self._fwd_fn = fwd

    def train_step(self, feats, mask, segs, labels, valid) -> Dict[str, float]:
        if self.params is None:
            self.init(feats, mask)
        self.rng, k = jax.random.split(self.rng)
        feats, mask, segs, labels, valid = self.core.shard(
            (feats, mask, segs, labels, valid))
        (self.params, self.opt_state, self.loss_norm, self.ema,
         losses) = self._step_fn(
            self.params, self.opt_state, self.loss_norm, self.ema, k,
            feats, mask, segs, labels, valid,
        )
        # ONE device_get for the whole dict: per-leaf float() costs a
        # device round-trip each (tens of ms over the tunneled chip)
        return {k_: float(v) for k_, v in
                jax.device_get(losses).items()}

    def train_epoch(self, items: List[dict], batch_size: int = 2) -> Dict[str, float]:
        # epoch-seeded per-process order (DistributedSampler semantics) —
        # multi-host runs walk disjoint shards; single-process unchanged
        from ...data.sampler import sharded_epoch_order

        self._epoch = getattr(self, "_epoch", -1) + 1
        order = sharded_epoch_order(len(items), self._epoch)
        agg: Dict[str, float] = {}
        nb = 0
        for i in range(0, len(items), batch_size):
            chunk = [items[j] for j in order[i : i + batch_size]]
            if len(chunk) < batch_size:
                continue
            feats, mask, segs, labels, valid = collate_tal(
                chunk, self.max_seq_len, self.max_num_gt, training=True
            )
            losses = self.train_step(feats, mask, segs, labels, valid)
            for k_, v in losses.items():
                agg[k_] = agg.get(k_, 0.0) + v
            nb += 1
        return {k_: v / max(nb, 1) for k_, v in agg.items()}

    def save(self, directory: str, step: int):
        """Checkpoint model/EMA/optimizer/loss-normalizer (the reference
        save_checkpoint contents, train_eval.py:89-106)."""
        from ...utils.checkpoint import save_checkpoint

        save_checkpoint(directory, step, dict(
            params=self.params, ema=self.ema.params,
            opt_state=self.opt_state, loss_norm=self.loss_norm,
        ))

    def restore(self, directory: str, feats, mask, step=None) -> int:
        """Resume from the latest (or given) step; returns the step."""
        from ...utils.checkpoint import latest_step, restore_checkpoint

        if self.params is None:
            self.init(feats, mask)
        step = step if step is not None else latest_step(directory)
        state = restore_checkpoint(directory, step, template=dict(
            params=self.params, ema=self.ema.params,
            opt_state=self.opt_state, loss_norm=self.loss_norm,
        ))
        self.params = state["params"]
        self.ema = self.ema._replace(params=state["ema"])
        self.opt_state = state["opt_state"]
        self.loss_norm = state["loss_norm"]
        return step

    def predict_video(self, item: dict, use_ema: bool = True) -> dict:
        """Single-video inference → NMS'd segments in seconds
        (meta_archs.py inference+postprocessing :628-786)."""
        params = self.ema.params if (use_ema and self.ema) else self.params
        feats, mask, *_ = collate_tal(
            [item], self.max_seq_len, self.max_num_gt, training=False,
            max_div_factor=self.model.scale_factor ** self.model.backbone_arch[2],
        )
        cls_logits, offsets, fpn_masks = self._fwd_fn(params, feats, mask)
        points = self.point_gen([m.shape[1] for m in fpn_masks])
        segs, scores, cls_idxs = decode_single_video(
            points,
            [m[0] for m in fpn_masks],
            [c[0] for c in cls_logits],
            [o[0] for o in offsets],
            self.test_cfg["pre_nms_thresh"], self.test_cfg["pre_nms_topk"],
            self.test_cfg["duration_thresh"],
        )
        if self.test_cfg["nms_method"] != "none":
            segs, scores, cls_idxs = batched_nms(
                segs, scores, cls_idxs,
                self.test_cfg["iou_threshold"], self.test_cfg["min_score"],
                self.test_cfg["max_seg_num"],
                use_soft_nms=self.test_cfg["nms_method"] == "soft",
                multiclass=self.test_cfg["multiclass_nms"],
                sigma=self.test_cfg["nms_sigma"],
                voting_thresh=self.test_cfg["voting_thresh"],
            )
        stride, nframes, fps = (
            item["feat_stride"], item["feat_num_frames"], item["fps"]
        )
        if len(segs):
            segs = (segs * stride + 0.5 * nframes) / fps
            segs = np.clip(segs, 0.0, float(item["duration"]))
        return dict(video_id=item["video_id"], segments=segs,
                    scores=scores, labels=cls_idxs)

    def evaluate(self, items: List[dict], tiou_thresholds=None,
                 use_ema: bool = True):
        """Run inference over items and compute mAP (ANETdetection)."""
        gt = {}
        for it in items:
            stride, nframes, fps = (
                it["feat_stride"], it["feat_num_frames"], it["fps"]
            )
            anns = []
            for (s, e), l in zip(it["segments"], it["labels"]):
                anns.append((
                    (s * stride + 0.5 * nframes) / fps,
                    (e * stride + 0.5 * nframes) / fps,
                    int(l),
                ))
            gt[it["video_id"]] = anns
        evaluator = ANETdetection(gt, tiou_thresholds)
        vids, t0, t1, sc, lb = [], [], [], [], []
        for it in items:
            r = self.predict_video(it, use_ema=use_ema)
            for (s, e), score, lab in zip(r["segments"], r["scores"], r["labels"]):
                vids.append(r["video_id"])
                t0.append(s)
                t1.append(e)
                sc.append(score)
                lb.append(int(lab))
        preds = {"video-id": vids, "t-start": np.array(t0), "t-end": np.array(t1),
                 "score": np.array(sc), "label": np.array(lb)}
        return evaluator.evaluate(preds)
