"""PDVC-Mamba model: multi-scale features → Mamba encoder → deformable
decoder with event queries → class/box/count/caption heads.

Reference: /root/reference/video-mamba-suite/video-dense-captioning/pdvc/
  deformable_transformer.py — MambaEncoderLayer (:233-279: ViM/DBM + FFN),
  DeformableTransformerDecoderLayer (:281-334: query self-attn + MSDeformAttn
  cross + FFN), decoder with iterative reference refinement (:337-390)
  pdvc.py — PDVC heads (:34-127): query_embed (Q, 2·d) split into
  (query_pos, tgt), class head with prior-prob bias, 3-layer box MLP
  (length bias −2), count head (max_eseq_length+1 classes)
  CaptioningHead/LSTM.py — LSTM captioner over [query_feat; word_emb].
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.mamba import MambaDBM, MambaVim
from ...ops.deform_attn import MSDeformAttn1D


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class FFN(nn.Module):
    d_ffn: int
    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_ffn, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(name="norm")(x + h)


class MambaEncoderLayer(nn.Module):
    """deformable_transformer.py:233-279."""

    d_model: int
    d_ffn: int = 1024
    dropout: float = 0.1
    mixer: str = "vim"
    impl: str = "auto"

    @nn.compact
    def __call__(self, src, pos, mask=None, deterministic: bool = True):
        h = src + pos if pos is not None else src
        if self.mixer == "vim":
            h = MambaVim(d_model=self.d_model, impl=self.impl, name="mamba")(h, mask)
        else:
            h = MambaDBM(d_model=self.d_model, expand=1, impl=self.impl,
                         name="mamba")(h, mask)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src + h)
        return FFN(self.d_ffn, self.d_model, self.dropout, name="ffn")(
            src, deterministic=deterministic
        )


class DeformableDecoderLayer(nn.Module):
    """deformable_transformer.py:281-334."""

    d_model: int
    d_ffn: int = 1024
    n_heads: int = 8
    n_levels: int = 4
    n_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, temporal_shapes,
                 src_padding_mask=None, deterministic: bool = True):
        q = tgt + query_pos
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, deterministic=deterministic,
            name="self_attn",
        )(q, q, tgt)
        tgt = nn.LayerNorm(name="norm2")(
            tgt + nn.Dropout(self.dropout)(att, deterministic=deterministic)
        )
        cross = MSDeformAttn1D(
            d_model=self.d_model, n_levels=self.n_levels,
            n_heads=self.n_heads, n_points=self.n_points, name="cross_attn",
        )(tgt + query_pos, reference_points, src, temporal_shapes,
          src_padding_mask)
        tgt = nn.LayerNorm(name="norm1")(
            tgt + nn.Dropout(self.dropout)(cross, deterministic=deterministic)
        )
        return FFN(self.d_ffn, self.d_model, self.dropout, name="ffn")(
            tgt, deterministic=deterministic
        )


class BoxMLP(nn.Module):
    """3-layer MLP → (center_offset, log-length); final layer zero-init,
    length bias −2 (pdvc.py:71-90)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.d_model, name="l0")(x))
        h = nn.relu(nn.Dense(self.d_model, name="l1")(h))
        out = nn.Dense(
            2, kernel_init=nn.initializers.zeros,
            bias_init=lambda k, s, d=jnp.float32: jnp.array([0.0, -2.0], d),
            name="l2",
        )(h)
        return out


class DeformableTransformer(nn.Module):
    """Mamba encoder over flattened multi-scale tokens + deformable decoder
    (deformable_transformer.py:27-120 + :337-390)."""

    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    dropout: float = 0.1
    mixer: str = "vim"
    impl: str = "auto"

    @nn.compact
    def __call__(self, srcs: List[jax.Array], masks: List[jax.Array],
                 pos_embeds: List[jax.Array], query_embed: jax.Array,
                 deterministic: bool = True):
        """srcs: per-level (B, T_l, C); masks (B, T_l) 1=valid;
        query_embed (Q, 2·d). Returns (hs per layer, refs per layer,
        memory, temporal_shapes)."""
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.n_levels, self.d_model),
        )
        temporal_shapes = [s.shape[1] for s in srcs]
        src_flat = jnp.concatenate(srcs, axis=1)
        mask_flat = jnp.concatenate(masks, axis=1)
        pos_flat = jnp.concatenate(
            [p + level_embed[l][None, None] for l, p in enumerate(pos_embeds)],
            axis=1,
        )

        memory = src_flat
        for i in range(self.num_encoder_layers):
            memory = MambaEncoderLayer(
                self.d_model, self.d_ffn, self.dropout, mixer=self.mixer,
                impl=self.impl, name=f"enc{i}",
            )(memory, pos_flat, mask_flat, deterministic=deterministic)

        B = src_flat.shape[0]
        Q = query_embed.shape[0]
        query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
        query_pos = jnp.tile(query_pos[None], (B, 1, 1)).astype(memory.dtype)
        tgt = jnp.tile(tgt[None], (B, 1, 1)).astype(memory.dtype)
        # initial reference points from query_pos (deformable_transformer
        # prepare_decoder_input_query)
        ref = jax.nn.sigmoid(
            nn.Dense(1, name="reference_points")(query_pos)
        )                                                   # (B, Q, 1)

        hs_layers, ref_layers = [], []
        padding = mask_flat < 0.5
        for i in range(self.num_decoder_layers):
            ref_input = jnp.tile(ref[:, :, None, :], (1, 1, self.n_levels, 1))
            tgt = DeformableDecoderLayer(
                self.d_model, self.d_ffn, self.n_heads, self.n_levels,
                self.n_points, self.dropout, name=f"dec{i}",
            )(tgt, query_pos, ref_input, memory, temporal_shapes,
              padding, deterministic=deterministic)
            # iterative refinement (deformable_transformer.py:363-381)
            delta = BoxMLP(self.d_model, name=f"refine{i}")(tgt)
            new_center = jax.nn.sigmoid(
                delta[..., :1] + inverse_sigmoid(ref)
            )
            ref = jax.lax.stop_gradient(new_center)
            hs_layers.append(tgt)
            ref_layers.append(new_center)
        return hs_layers, ref_layers, memory, temporal_shapes


class LSTMCaptioner(nn.Module):
    """LSTM caption head (CaptioningHead/LSTM.py:20): input [event_feat;
    word_emb], teacher forcing for training logits, greedy scan decode."""

    vocab_size: int
    d_model: int = 256
    word_dim: int = 256
    hidden_dim: int = 512
    max_caption_len: int = 20

    def setup(self):
        self.word_embed = nn.Embed(self.vocab_size, self.word_dim)
        self.cell = nn.OptimizedLSTMCell(self.hidden_dim)
        self.logit = nn.Dense(self.vocab_size)
        self.feat_proj = nn.Dense(self.hidden_dim)

    def __call__(self, event_feats: jax.Array, captions: jax.Array):
        """Teacher-forced logits. event_feats (N, C); captions (N, L) with
        BOS=0 first. Returns (N, L, vocab) next-token logits.

        Static Python loop (L ≤ max_caption_len): linen param creation can't
        happen inside lax.scan, and XLA unrolls short loops fine.
        """
        N, L = captions.shape
        feat = self.feat_proj(event_feats)                   # (N, H)
        carry = (jnp.zeros_like(feat), feat)                 # init c=0, h=feat
        words = self.word_embed(captions)                    # (N, L, W)
        outs = []
        for t in range(L):
            carry, out = self.cell(carry, words[:, t])
            outs.append(out)
        return self.logit(jnp.stack(outs, axis=1))

    def decode_greedy(self, event_feats: jax.Array, bos: int = 0,
                      eos: int = 0):
        """Greedy decode → ((N, max_caption_len) token ids,
        (N, max_caption_len) per-token log-probs of the chosen tokens —
        the `sentence_score` source for reranking, eval_utils.py:153)."""
        N = event_feats.shape[0]
        feat = self.feat_proj(event_feats)
        carry = (jnp.zeros_like(feat), feat)
        tok = jnp.full((N,), bos, jnp.int32)
        toks, lps = [], []
        for _ in range(self.max_caption_len):
            w = self.word_embed(tok)
            carry, out = self.cell(carry, w)
            logits = self.logit(out)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lps.append(jnp.take_along_axis(lp, tok[:, None], axis=-1)[:, 0])
            toks.append(tok)
        return jnp.stack(toks, axis=1), jnp.stack(lps, axis=1)


class PDVC(nn.Module):
    """Meta-arch (pdvc.py:34-230): multi-scale conv features → transformer →
    per-layer class/count/box heads + caption head on the last layer."""

    input_dim: int
    num_classes: int = 1
    vocab_size: int = 100
    num_queries: int = 10
    d_model: int = 256
    n_levels: int = 4
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    max_eseq_length: int = 10
    max_caption_len: int = 20
    mixer: str = "vim"
    impl: str = "auto"

    def setup(self):
        self.input_projs = [
            nn.Dense(self.d_model, name=f"input_proj{l}")
            for l in range(1)
        ]
        self.level_convs = [
            nn.Conv(self.d_model, (3,), strides=(2,), padding="SAME",
                    name=f"level_conv{l}")
            for l in range(self.n_levels - 1)
        ]
        self.transformer = DeformableTransformer(
            d_model=self.d_model, n_levels=self.n_levels,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            mixer=self.mixer, impl=self.impl, name="transformer",
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.d_model * 2),
        )
        prior = 0.01
        bias = -math.log((1 - prior) / prior)
        self.class_head = nn.Dense(
            self.num_classes,
            bias_init=lambda k, s, d=jnp.float32: jnp.full(s, bias, d),
            name="class_head",
        )
        self.count_head = nn.Dense(self.max_eseq_length + 1, name="count_head")
        self.bbox_head = BoxMLP(self.d_model, name="bbox_head")
        self.caption_head = LSTMCaptioner(
            vocab_size=self.vocab_size, d_model=self.d_model,
            max_caption_len=self.max_caption_len, name="caption_head",
        )

    def _features(self, feats, mask, deterministic):
        """Build n_levels multi-scale token pyramids + sinusoid positions."""
        from ...models.common import sinusoid_positions

        x = self.input_projs[0](feats)
        srcs, masks, poss = [x], [mask], []
        m = mask
        for conv in self.level_convs:
            x = conv(x)
            m = m[:, ::2][:, : x.shape[1]]
            srcs.append(x)
            masks.append(m)
        for s in srcs:
            poss.append(
                sinusoid_positions(s.shape[1], self.d_model)[None].astype(s.dtype)
            )
        return srcs, masks, poss

    def __call__(self, feats, mask, deterministic: bool = True):
        """feats (B, T, C), mask (B, T) → dict of outputs (last decoder
        layer + aux list)."""
        srcs, masks, poss = self._features(feats, mask, deterministic)
        hs, refs, memory, shapes = self.transformer(
            srcs, masks, poss, self.query_embed, deterministic=deterministic
        )
        outs = []
        for h, r in zip(hs, refs):
            logits = self.class_head(h)                     # (B, Q, n_cls)
            counts = self.count_head(jnp.max(h, axis=1))    # (B, max_eseq+1)
            box = self.bbox_head(h)
            center = jax.nn.sigmoid(box[..., :1] + inverse_sigmoid(r))
            length = jax.nn.sigmoid(box[..., 1:])
            outs.append(dict(
                pred_logits=logits,
                pred_boxes=jnp.concatenate([center, length], -1),
                pred_count=counts,
            ))
        out = outs[-1]
        out["aux_outputs"] = outs[:-1]
        out["query_feats"] = hs[-1]
        return out

    def caption_logits(self, query_feats, captions):
        """Teacher-forced caption logits for matched queries.
        query_feats (N, C), captions (N, L)."""
        return self.caption_head(query_feats, captions)

    def init_all(self, feats, mask):
        """Initialization entry touching every submodule (the caption head is
        only reachable via its own methods)."""
        out = self(feats, mask)
        qf = out["query_feats"].reshape(-1, self.d_model)
        dummy = jnp.zeros((qf.shape[0], 2), jnp.int32)
        self.caption_head(qf, dummy)
        return out

    def caption_greedy(self, query_feats):
        return self.caption_head.decode_greedy(query_feats)
