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
from .common import W8Embed
from .mamba import Block, MambaCausal, make_block


def scaled_out_proj_init(n_layer: int, initializer_range: float = 0.02):
    """GPT-2 residual-path depth scaling: N(0, σ/√(2·n_layer))
    (mixer_seq_simple.py:63-80)."""
    std = initializer_range / math.sqrt(2 * n_layer)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class MoEFFNBlock(nn.Module):
    """Pre-norm MoE feed-forward block in the (hidden, residual) stream —
    the MoE-Mamba interleave pattern (no reference analogue; beyond-ref
    capability pairing `parallel/expert.py` with the LM stack). The Switch
    aux loss is sown into the 'intermediates' collection under 'moe_aux'."""

    dim: int
    num_experts: int
    d_hidden: int
    capacity_factor: float = 1.25
    rms: bool = True
    norm_eps: float = 1e-5
    residual_in_fp32: bool = True
    mesh: Optional[Any] = None

    def setup(self):
        self.norm_w = self.param(
            "norm_w", nn.initializers.ones, (self.dim,), jnp.float32)
        self.norm_b = (
            None if self.rms
            else self.param("norm_b", nn.initializers.zeros, (self.dim,),
                            jnp.float32))
        from ..parallel.expert import MoEMlp

        self.moe = MoEMlp(
            d_model=self.dim, d_hidden=self.d_hidden,
            num_experts=self.num_experts,
            capacity_factor=self.capacity_factor, mesh=self.mesh,
            name="moe")

    def __call__(self, hidden_states, residual=None):
        hidden_states, residual = fused_add_norm(
            hidden_states, self.norm_w, self.norm_b, residual=residual,
            prenorm=True, residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_eps, is_rms_norm=self.rms)
        hidden_states, aux = self.moe(hidden_states)
        self.sow("intermediates", "moe_aux", aux)
        return hidden_states, residual

    def step(self, hidden_states, residual):
        """Single-token variant: hidden_states (batch, dim). With the
        per-row grouping default the single-token group can never overflow
        capacity, so decode computes the exact per-token expert function;
        it matches the full forward wherever training routing had no drops
        (capacity drops are a training-time approximation)."""
        hidden_states, residual = fused_add_norm(
            hidden_states, self.norm_w, self.norm_b, residual=residual,
            prenorm=True, residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_eps, is_rms_norm=self.rms)
        h, _ = self.moe(hidden_states[:, None, :])
        return h[:, 0, :], residual


class MixerModel(nn.Module):
    """Embedding → n×Block(causal Mamba) → final norm.

    `moe_every=k` interleaves a pre-norm Switch-MoE feed-forward block after
    every k-th Mamba block (MoE-Mamba pattern); experts shard over an
    'expert' mesh axis when `moe_mesh` is given (see parallel/expert.py)."""

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
    moe_every: int = 0
    moe_num_experts: int = 4
    moe_d_hidden: Optional[int] = None
    moe_capacity_factor: float = 1.25
    moe_mesh: Optional[Any] = None

    def setup(self):
        # W8Embed == nn.Embed unless apply() receives an offline-quantized
        # int8 table (quant_decode.quantize_lm_for_decode)
        self.embedding = W8Embed(
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
        self.moe_blocks = [
            MoEFFNBlock(
                dim=self.d_model, num_experts=self.moe_num_experts,
                d_hidden=self.moe_d_hidden or 4 * self.d_model,
                capacity_factor=self.moe_capacity_factor,
                rms=self.rms_norm, norm_eps=self.norm_eps,
                residual_in_fp32=self.residual_in_fp32, mesh=self.moe_mesh,
            )
            if self.moe_every and (i + 1) % self.moe_every == 0 else None
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
        for layer, moe in zip(self.layers, self.moe_blocks):
            hidden, residual = layer(hidden, residual)
            if moe is not None:
                hidden, residual = moe(hidden, residual)
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
        for layer, moe, st in zip(self.layers, self.moe_blocks, states):
            hidden, residual, st = layer.step(hidden, residual, st)
            if moe is not None:
                hidden, residual = moe.step(hidden, residual)
            new_states.append(st)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, self.norm_f_b, residual=residual,
            prenorm=False, eps=self.norm_eps, is_rms_norm=self.rms_norm,
        )
        return hidden, new_states

    def prefill(self, input_ids: jax.Array):
        """One full forward over the prompt that also yields per-layer
        decode states — replaces prompt_len sequential `step` calls
        (the reference's seqlen_offset=0 prefill, utils/generation.py:93).
        input_ids (batch, L) → (hidden (batch, L, d), states)."""
        hidden = self.embedding(input_ids)
        residual = None
        states = []
        for layer, moe in zip(self.layers, self.moe_blocks):
            hidden, residual, st = layer.prefill(hidden, residual)
            if moe is not None:
                hidden, residual = moe(hidden, residual)
            states.append(st)
        hidden, _ = fused_add_norm(
            hidden, self.norm_f_w, self.norm_f_b, residual=residual,
            prenorm=False, eps=self.norm_eps, is_rms_norm=self.rms_norm,
        )
        return hidden, states


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
    moe_every: int = 0
    moe_num_experts: int = 4
    moe_d_hidden: Optional[int] = None
    moe_capacity_factor: float = 1.25
    moe_mesh: Optional[Any] = None

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return -(-self.vocab_size // m) * m

    def setup(self):
        self.backbone = MixerModel(
            d_model=self.d_model, n_layer=self.n_layer,
            vocab_size=self.padded_vocab, d_state=self.d_state,
            d_conv=self.d_conv, expand=self.expand, rms_norm=self.rms_norm,
            moe_every=self.moe_every,
            moe_num_experts=self.moe_num_experts,
            moe_d_hidden=self.moe_d_hidden,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_mesh=self.moe_mesh,
        )

    def _logits(self, hidden: jax.Array) -> jax.Array:
        """Tied lm head: logits = hidden @ E^T. With an offline-quantized
        int8 table (quant_decode), E's per-row scales become the logits'
        per-vocab-column scales — the matmul reads int8, halving the
        dominant term of the decode weight stream."""
        embmod = self.backbone.embedding
        emb = embmod.embedding
        if embmod.has_variable("qscale", "embedding"):
            s = embmod.get_variable("qscale", "embedding")   # (vocab,) f32
            y = jnp.dot(hidden.astype(jnp.bfloat16),
                        emb.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y * s
        return jnp.dot(hidden, emb.T.astype(hidden.dtype))

    def __call__(self, input_ids: jax.Array) -> jax.Array:
        return self._logits(self.backbone(input_ids))

    def step(self, token: jax.Array, states):
        """One decode step: (batch,) token → ((batch, vocab) logits, states)."""
        hidden, states = self.backbone.step(token, states)
        return self._logits(hidden), states

    def prefill(self, input_ids: jax.Array):
        """Batched prompt prefill: (batch, L) ids → ((batch, vocab) logits
        at the LAST prompt position, per-layer decode states). One fused
        full-sequence pass instead of L `step` calls."""
        hidden, states = self.backbone.prefill(input_ids)
        return self._logits(hidden[:, -1]), states

    def moe_aux_loss(self, intermediates) -> jax.Array:
        """Sum the sown Switch load-balance losses ('moe_aux' entries only
        — other sown intermediates are ignored). Run apply with
        `mutable=["intermediates"]` and pass the collection here."""
        leaves = [
            v for path, v in
            jax.tree_util.tree_leaves_with_path(intermediates)
            if any(getattr(k, "key", None) == "moe_aux" for k in path)
        ]
        return sum(leaves) if leaves else jnp.zeros(())

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
