"""PDVC trainer: one jitted step with a host Hungarian callback.

Reference flow: /root/reference/video-mamba-suite/video-dense-captioning/
train.py:35-120 (DDP Adam, grad clip) + pdvc.py forward/criterion. The
matcher runs on host inside the jitted step via jax.pure_callback
(SURVEY.md §7 hard part e: host matching without serializing the step into
multiple dispatches). On runtimes without host send/recv support (the
tunneled `axon` TPU plugin raises UNIMPLEMENTED for every callback),
train_step transparently switches to a two-phase path — jitted cost
forward → host linear_sum_assignment → jitted prematched grad step — that
is bit-identical to the callback path (same rng ⇒ same dropout masks in
both forwards; tests/test_captioning.py pins the equivalence).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...utils.optim import make_optimizer
from ...utils.trainer import TrainerCore
from .criterion import pdvc_losses
from .matcher import hungarian_match, match_cost
from .metrics import evaluate_dvc, soda_c
from .model import PDVC

_CALLBACK_OK: Optional[bool] = None


def _callback_supported() -> bool:
    """One-time, process-wide probe: does the runtime dispatch host
    callbacks? (The axon TPU runtime rejects send/recv with UNIMPLEMENTED.)
    Narrow except: an unrelated transient failure (OOM, tunnel flake) must
    propagate, not silently pin the trainer to the two-phase path."""
    global _CALLBACK_OK
    if _CALLBACK_OK is None:
        try:
            jax.jit(lambda x: jax.pure_callback(
                lambda a: a, jax.ShapeDtypeStruct((), jnp.float32), x,
            ))(jnp.float32(0)).block_until_ready()
            _CALLBACK_OK = True
        except jax.errors.JaxRuntimeError as e:
            if not any(s in str(e) for s in
                       ("UNIMPLEMENTED", "callback", "send", "recv")):
                raise
            _CALLBACK_OK = False
    return _CALLBACK_OK


class CaptioningTrainer:
    def __init__(self, model: PDVC, lr: float = 5e-5, weight_decay: float = 1e-4,
                 grad_clip: float = 0.1, seed: int = 0, use_mesh: bool = False):
        self.model = model
        self.tx = make_optimizer("adamw", lr=lr, weight_decay=weight_decay,
                                 grad_clip=grad_clip)
        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        # NB: the Hungarian host callback forces its operands replicated
        # under GSPMD (an implicit all-gather) — correct, matches the
        # reference's rank-local matching cost profile.
        self.core = TrainerCore(use_mesh=use_mesh)

        model_, tx = self.model, self.tx

        def make_loss_fn(rng, feats, mask, gt_boxes, gt_labels, gt_valid,
                         captions, prematched_idx=None):
            """prematched_idx=None → Hungarian host callback inside the jit
            (one dispatch/step). The tunneled `axon` TPU runtime rejects ALL
            host send/recv callbacks (UNIMPLEMENTED), so train_step falls
            back to a two-phase path there: a jitted cost pass, host
            linear_sum_assignment, then this loss with the indices passed in
            as a regular array. Same rng → identical dropout masks in both
            passes, so the matching is computed from the SAME forward the
            gradient sees (the reference's semantics, pdvc.py criterion)."""
            def loss_fn(p):
                out = model_.apply(
                    p, feats, mask, deterministic=False,
                    rngs={"dropout": rng},
                )
                if prematched_idx is None:
                    cost = jax.vmap(match_cost)(
                        out["pred_logits"], out["pred_boxes"],
                        gt_labels, gt_boxes, gt_valid,
                    )
                    n_valid = jnp.sum(gt_valid, axis=1)
                    match_idx = hungarian_match(
                        jax.lax.stop_gradient(cost), n_valid
                    )
                else:
                    match_idx = prematched_idx
                # gather matched query features → caption logits
                safe_idx = jnp.clip(match_idx, 0, out["query_feats"].shape[1] - 1)
                qf = jax.vmap(lambda h, i: h[i])(out["query_feats"], safe_idx)
                B, G, L = captions.shape
                cap_in = jnp.where(captions == -100, 0, captions)
                if model_.caption_decoder_type == "none":
                    losses = pdvc_losses(
                        out, gt_boxes, gt_labels, gt_valid, match_idx)
                    return losses["loss_total"], losses
                cap_kw = {}
                if model_.caption_decoder_type == "standard":
                    boxes = jax.vmap(lambda b, i: b[i])(out["pred_boxes"],
                                                        safe_idx)
                    cap_kw = dict(
                        refs=boxes.reshape(B * G, 2),
                        memory=jnp.repeat(out["memory"], G, axis=0),
                        shapes=model_.level_shapes(feats.shape[1]),
                    )
                cap_logits = model_.apply(
                    p, qf.reshape(B * G, -1), cap_in.reshape(B * G, L),
                    method="caption_logits", **cap_kw,
                ).reshape(B, G, L, -1)
                # next-token prediction: logits[t] predicts captions[t+1]
                losses = pdvc_losses(
                    out, gt_boxes, gt_labels, gt_valid, match_idx,
                    caption_logits=cap_logits[:, :, :-1],
                    caption_targets=captions[:, :, 1:],
                )
                return losses["loss_total"], losses

            return loss_fn

        def apply_grads(loss_fn, params, opt_state):
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, losses

        @jax.jit
        def step(params, opt_state, rng, feats, mask,
                 gt_boxes, gt_labels, gt_valid, captions):
            return apply_grads(
                make_loss_fn(rng, feats, mask, gt_boxes, gt_labels,
                             gt_valid, captions),
                params, opt_state)

        @jax.jit
        def cost_fwd(params, rng, feats, mask, gt_boxes, gt_labels, gt_valid):
            # phase 1 of the no-callback path: same forward (same rng ⇒
            # same dropout masks) → matching cost only
            out = model_.apply(params, feats, mask, deterministic=False,
                               rngs={"dropout": rng})
            return jax.vmap(match_cost)(
                out["pred_logits"], out["pred_boxes"],
                gt_labels, gt_boxes, gt_valid,
            )

        @jax.jit
        def step_prematched(params, opt_state, rng, feats, mask,
                            gt_boxes, gt_labels, gt_valid, captions,
                            match_idx):
            return apply_grads(
                make_loss_fn(rng, feats, mask, gt_boxes, gt_labels,
                             gt_valid, captions, prematched_idx=match_idx),
                params, opt_state)

        self._cost_fwd = cost_fwd
        self._step_prematched = step_prematched
        self._use_callback = None  # probed on first train_step

        @jax.jit
        def fwd(params, feats, mask):
            out = model_.apply(params, feats, mask, deterministic=True)
            B, Q = out["query_feats"].shape[:2]
            if model_.caption_decoder_type == "none":
                # proposal-only: empty captions (EOS at t=0), zero scores
                L = model_.max_caption_len
                return (out, jnp.zeros((B, Q, L), jnp.int32),
                        jnp.zeros((B, Q, L), jnp.float32))
            cap_kw = {}
            if model_.caption_decoder_type == "standard":
                cap_kw = dict(
                    refs=out["pred_boxes"].reshape(B * Q, 2),
                    memory=jnp.repeat(out["memory"], Q, axis=0),
                    shapes=model_.level_shapes(feats.shape[1]),
                )
            caps, cap_lps = model_.apply(
                params,
                out["query_feats"].reshape(-1, out["query_feats"].shape[-1]),
                method="caption_greedy", **cap_kw,
            )
            return (out, caps.reshape(B, -1, caps.shape[-1]),
                    cap_lps.reshape(B, -1, cap_lps.shape[-1]))

        self._step = step
        self._fwd = fwd

    def init(self, feats, mask):
        self.rng, k = jax.random.split(self.rng)
        self.params = self.core.prepare(self.model.init(
            {"params": k, "dropout": k}, feats, mask, method="init_all"
        ))
        self.opt_state = self.core.prepare(self.tx.init(self.params))

    def state_dict(self):
        return dict(params=self.params, opt_state=self.opt_state)

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def save(self, directory: str, step: int):
        """Checkpoint (reference model-best.pth + info.json, train.py:54-120)."""
        self.core.save(directory, step, self.state_dict())

    def restore(self, directory: str, feats, mask, step=None):
        if self.params is None:
            self.init(feats, mask)
        state = self.core.restore(directory, self.state_dict(), step)
        if state is not None:
            self.load_state_dict(state)
        return self.core.latest_step(directory)

    def train_step(self, feats, mask, gt_boxes, gt_labels, gt_valid,
                   captions) -> Dict[str, float]:
        if self.params is None:
            self.init(feats, mask)
        self.rng, k = jax.random.split(self.rng)
        n_valid_host = np.asarray(gt_valid).sum(axis=1).astype(np.int32)
        feats, mask, gt_boxes, gt_labels, gt_valid, captions = self.core.shard(
            (feats, mask, gt_boxes, gt_labels, gt_valid, captions))
        if self._use_callback is None:
            self._use_callback = _callback_supported()
        if self._use_callback:
            try:
                self.params, self.opt_state, losses = self._step(
                    self.params, self.opt_state, k, feats, mask,
                    gt_boxes, gt_labels, gt_valid, captions,
                )
                return {k_: float(v) for k_, v in
                        jax.device_get(losses).items()}
            except jax.errors.JaxRuntimeError as e:
                if "callback" not in str(e):
                    raise
                # axon TPU runtime: no host send/recv callbacks — switch to
                # the two-phase path (cost pass → host LSA → grad pass)
                self._use_callback = False
        from .matcher import _host_lsa

        cost = self._cost_fwd(self.params, k, feats, mask,
                              gt_boxes, gt_labels, gt_valid)
        match_idx = _host_lsa(np.asarray(jax.device_get(cost)), n_valid_host)
        (match_idx,) = self.core.shard((match_idx,))
        self.params, self.opt_state, losses = self._step_prematched(
            self.params, self.opt_state, k, feats, mask,
            gt_boxes, gt_labels, gt_valid, captions, match_idx,
        )
        # ONE device_get for the whole dict: per-leaf float() costs a
        # device round-trip each (tens of ms over the tunneled chip)
        return {k_: float(v) for k_, v in
                jax.device_get(losses).items()}

    def predict(self, feats, mask, duration: float, topk: int = 10,
                vocab: Optional[List[str]] = None) -> List[dict]:
        """Decode events + captions for one batch; returns per-video lists of
        {timestamp, sentence, score, proposal_score, sentence_score,
        pred_event_count} ranked by class prob (the rerank fields of the
        reference dvc json, eval_utils.py:144-166)."""
        out, caps, cap_lps = self._fwd(self.params, feats, mask)
        probs = np.asarray(jax.nn.sigmoid(out["pred_logits"]).max(-1))
        boxes = np.asarray(out["pred_boxes"])
        counts = np.asarray(jnp.argmax(out["pred_count"], axis=-1))
        caps = np.asarray(caps)
        cap_lps = np.asarray(cap_lps)
        results = []
        for b in range(feats.shape[0]):
            order = np.argsort(-probs[b])[:topk]
            events = []
            for q in order:
                c, l = boxes[b, q]
                start, end = (c - l / 2) * duration, (c + l / 2) * duration
                toks = caps[b, q]
                words, sent_lp = [], 0.0
                for i, t in enumerate(toks):
                    if t == 0:
                        break
                    words.append(vocab[t] if vocab else str(int(t)))
                    sent_lp += float(cap_lps[b, q, i])
                events.append(dict(
                    timestamp=[float(start), float(end)],
                    sentence=" ".join(words),
                    score=float(probs[b, q]),
                    proposal_score=float(probs[b, q]),
                    sentence_score=sent_lp,
                    pred_event_count=int(counts[b]),
                ))
            results.append(events)
        return results
