"""LSTR-Mamba: long/work memory anticipation model with streaming decode.

Reference: /root/reference/video-mamba-suite/action-anticipation/src/
rekognition_online_action_detection/models/lstr.py — with MAMBA_LAYER > 0 the
token stream is [long memory; work memory; anticipation queries], processed
by *causal* (unidirectional) Mamba blocks + final RMSNorm (:281-301); outputs
are classified per position (work + anticipation), optional verb/noun heads
(:163-176). Streaming inference carries per-layer (conv, ssm) states
(LSTRStream.stream_inference :337-472) — here via MambaCausal.step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.common import sinusoid_positions
from ...models.mamba import Block, MambaCausal, make_block
from ...ops import fused_add_norm


class NormalizedLinear(nn.Module):
    """Cosine classifier (models/normalized_linear.py, the FC_NORM option):
    logits = scale · (x/|x|) @ (W/|W|)."""

    features: int
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        xf = x.astype(jnp.float32)
        xn = xf / jnp.sqrt(jnp.sum(xf * xf, -1, keepdims=True) + 1e-8)
        wn = w / jnp.sqrt(jnp.sum(w * w, 0, keepdims=True) + 1e-8)
        return (self.scale * xn @ wn).astype(x.dtype)


class FeatureHead(nn.Module):
    """Fuse visual+motion (+object) features → d_model (feature_head.py)."""

    d_model: int

    @nn.compact
    def __call__(self, visual, motion=None, obj=None):
        parts = [visual]
        if motion is not None:
            parts.append(motion)
        if obj is not None:
            parts.append(obj)
        x = jnp.concatenate(parts, axis=-1)
        return nn.relu(nn.Dense(self.d_model, name="fusion")(x))


class LSTRMamba(nn.Module):
    visual_dim: int
    motion_dim: int = 0
    d_model: int = 1024
    num_classes: int = 3807
    num_verbs: int = 0
    num_nouns: int = 0
    long_memory_num_samples: int = 512
    work_memory_num_samples: int = 32
    anticipation_num_samples: int = 0
    mamba_layers: int = 2
    dropout_cls: float = 0.0
    fc_norm: bool = False   # cosine classifier (MODEL.LSTR.FC_NORM)
    impl: str = "auto"

    def setup(self):
        self.feature_head_long = FeatureHead(self.d_model, name="head_long")
        self.feature_head_work = FeatureHead(self.d_model, name="head_work")
        self.blocks = [
            make_block(self.d_model, mixer="causal", layer_idx=i,
                       rms_norm_block=True, impl=self.impl)
            for i in range(self.mamba_layers)
        ]
        self.norm_f_w = self.param(
            "norm_f_w", nn.initializers.ones, (self.d_model,), jnp.float32
        )
        if self.anticipation_num_samples > 0:
            self.dec_query = self.param(
                "dec_query", nn.initializers.normal(0.02),
                (self.anticipation_num_samples, self.d_model),
            )
        if self.fc_norm:
            self.classifier = NormalizedLinear(self.num_classes,
                                               name="classifier")
        else:
            self.classifier = nn.Dense(self.num_classes, name="classifier")
        if self.num_verbs:
            self.classifier_verb = nn.Dense(self.num_verbs, name="classifier_verb")
        if self.num_nouns:
            self.classifier_noun = nn.Dense(self.num_nouns, name="classifier_noun")

    def _encode(self, tokens, deterministic: bool = True):
        hidden, residual = tokens, None
        for blk in self.blocks:
            hidden, residual = blk(hidden, residual)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, None, residual=residual, prenorm=False,
            is_rms_norm=True,
        )
        return hidden

    def _tokens(self, visual, motion, deterministic):
        """Build [long; work; anticipation] tokens with positional encoding."""
        L = self.long_memory_num_samples
        long_v = visual[:, :L]
        work_v = visual[:, L:]
        long_m = motion[:, :L] if motion is not None else None
        work_m = motion[:, L:] if motion is not None else None
        long_tok = self.feature_head_long(long_v, long_m)
        work_tok = self.feature_head_work(work_v, work_m)
        W = work_tok.shape[1]
        pe = sinusoid_positions(L + W + self.anticipation_num_samples,
                                self.d_model)
        long_tok = long_tok + pe[None, :L].astype(long_tok.dtype)
        work_tok = work_tok + pe[None, L : L + W].astype(work_tok.dtype)
        toks = [long_tok, work_tok]
        if self.anticipation_num_samples > 0:
            B = visual.shape[0]
            ant = jnp.tile(self.dec_query[None], (B, 1, 1)) + pe[
                None, L + W :
            ].astype(long_tok.dtype)
            toks.append(ant)
        return jnp.concatenate(toks, axis=1), L, W

    def __call__(self, visual, motion=None, deterministic: bool = True):
        """visual (B, long+work, Dv), motion optional same length.

        Returns dict with 'score' (B, work+ant, num_classes) and optional
        verb/noun scores.
        """
        tokens, L, W = self._tokens(visual, motion, deterministic)
        hidden = self._encode(tokens, deterministic)
        out_tokens = hidden[:, L:]  # work + anticipation positions
        if self.dropout_cls > 0:
            out_tokens = nn.Dropout(self.dropout_cls)(
                out_tokens, deterministic=deterministic
            )
        out: Dict[str, jax.Array] = {"score": self.classifier(out_tokens)}
        if self.num_verbs:
            out["score_verb"] = self.classifier_verb(out_tokens)
        if self.num_nouns:
            out["score_noun"] = self.classifier_noun(out_tokens)
        return out

    # -- streaming inference (LSTRStream equivalent) -----------------------

    def init_stream(self, batch: int):
        """Per-layer (conv_state, ssm_state) + residual-free carry."""
        states = []
        for blk in self.blocks:
            states.append(blk.mixer.init_state(batch))
        return states

    def stream_step(self, token, states):
        """Advance one fused token (B, d_model) through the causal stack.

        The functional analogue of LSTRStream.stream_inference's per-frame
        long-memory updates (lstr.py:337-472): feed each new frame token once,
        keep Mamba states instead of a memory buffer.
        """
        hidden, residual = token, None
        new_states = []
        for blk, st in zip(self.blocks, states):
            hidden, residual, st = blk.step(hidden, residual, st)
            new_states.append(st)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, None, residual=residual, prenorm=False,
            is_rms_norm=True,
        )
        return self.classifier(hidden), new_states

    def embed_work_token(self, visual, motion=None):
        """Fuse one frame's features for streaming (B, Dv) → (B, d_model)."""
        return self.feature_head_work(visual, motion)

    def stream_prefill(self, tokens):
        """Warm the streaming states from a (B, L, d_model) fused-token
        history in ONE full-sequence pass — the analogue of LSTRStream
        priming its long memory before per-frame updates (lstr.py:337-400),
        replacing L sequential `stream_step` calls with batched matmuls +
        one fused scan per layer.

        Returns ((B, L, num_classes) scores, states) with `states` exactly
        where `stream_step` would have left them (parity-tested)."""
        hidden, residual = tokens, None
        new_states = []
        for blk in self.blocks:
            hidden, residual, st = blk.prefill(hidden, residual)
            new_states.append(st)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, None, residual=residual, prenorm=False,
            is_rms_norm=True,
        )
        return self.classifier(hidden), new_states
