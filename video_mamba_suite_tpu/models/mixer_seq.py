"""Mamba sequence model / LM head stack.

Capability match for /root/reference/mamba/mamba_ssm/models/mixer_seq_simple.py
(MixerModel:83-170, MambaLMHeadModel:173-233) with GPT-2-style depth-scaled
initialization (_init_weights:51-80). Decoding runs as a jitted `lax.scan`
loop over functional per-layer states — the XLA-native equivalent of the
reference's CUDA-graph cached decode (utils/generation.py:243-377).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fused_add_norm, layer_norm, rms_norm
from .mamba import Block, MambaCausal, make_block


def scaled_out_proj_init(n_layer: int, initializer_range: float = 0.02):
    """GPT-2 residual-path depth scaling: N(0, σ/√(2·n_layer))
    (mixer_seq_simple.py:63-80)."""
    std = initializer_range / math.sqrt(2 * n_layer)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class MixerModel(nn.Module):
    """Embedding → n×Block(causal Mamba) → final norm."""

    d_model: int
    n_layer: int
    vocab_size: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    rms_norm: bool = True
    residual_in_fp32: bool = True
    norm_eps: float = 1e-5
    initializer_range: float = 0.02

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.d_model,
            embedding_init=nn.initializers.normal(self.initializer_range),
        )
        self.layers = [
            make_block(
                self.d_model, mixer="causal", layer_idx=i,
                rms_norm_block=self.rms_norm,
                residual_in_fp32=self.residual_in_fp32,
                norm_eps=self.norm_eps,
                d_state=self.d_state, d_conv=self.d_conv, expand=self.expand,
            )
            for i in range(self.n_layer)
        ]
        self.norm_f_w = self.param(
            "norm_f_w", nn.initializers.ones, (self.d_model,), jnp.float32
        )
        self.norm_f_b = (
            None if self.rms_norm
            else self.param("norm_f_b", nn.initializers.zeros,
                            (self.d_model,), jnp.float32)
        )

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        hidden = self.embedding(input_ids)
        residual = None
        for layer in self.layers:
            hidden, residual = layer(hidden, residual)
        # final fused add + norm (mixer_seq_simple.py:148-166)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, self.norm_f_b, residual=residual,
            prenorm=False, eps=self.norm_eps, is_rms_norm=self.rms_norm,
        )
        return hidden

    def step(self, token: jax.Array, states):
        """One decode step. token (batch,) int → (hidden (batch, d), states)."""
        hidden = self.embedding(token)
        residual = None
        new_states = []
        for layer, st in zip(self.layers, states):
            hidden, residual, st = layer.step(hidden, residual, st)
            new_states.append(st)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, self.norm_f_b, residual=residual,
            prenorm=False, eps=self.norm_eps, is_rms_norm=self.rms_norm,
        )
        return hidden, new_states


class MambaLMHeadModel(nn.Module):
    """LM with weight-tied head (mixer_seq_simple.py:173-233)."""

    d_model: int
    n_layer: int
    vocab_size: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    rms_norm: bool = True
    pad_vocab_size_multiple: int = 8

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return -(-self.vocab_size // m) * m

    def setup(self):
        self.backbone = MixerModel(
            d_model=self.d_model, n_layer=self.n_layer,
            vocab_size=self.padded_vocab, d_state=self.d_state,
            d_conv=self.d_conv, expand=self.expand, rms_norm=self.rms_norm,
        )

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        hidden = self.backbone(input_ids)
        # tied lm head: logits = hidden @ E^T
        emb = self.backbone.embedding.embedding
        return jnp.dot(hidden, emb.T.astype(hidden.dtype))

    def step(self, token: jax.Array, states):
        """One decode step: (batch,) token → ((batch, vocab) logits, states)."""
        hidden, states = self.backbone.step(token, states)
        emb = self.backbone.embedding.embedding
        return jnp.dot(hidden, emb.T.astype(hidden.dtype)), states

    def init_states(self, batch: int):
        """Zeroed per-layer (conv_state, ssm_state) — the functional
        InferenceParams (generation.py:18-27)."""
        d_inner = self.d_model * self.expand
        return [
            (
                jnp.zeros((batch, self.d_conv, d_inner), jnp.float32),
                jnp.zeros((batch, d_inner, self.d_state), jnp.float32),
            )
            for _ in range(self.n_layer)
        ]
