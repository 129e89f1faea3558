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


def pdvc_level_shapes(T: int, n_levels: int):
    """Static per-level temporal lengths of PDVC._features' stride-2 conv
    pyramid (nn.Conv SAME: out = ceil(in/2))."""
    shapes = [T]
    for _ in range(n_levels - 1):
        shapes.append(-(-shapes[-1] // 2))
    return tuple(shapes)


class DSACaptioner(nn.Module):
    """LSTM-DSA caption head — the published configs' `caption_decoder_type:
    standard` (cfgs/anet_c3d_pdvc.yml:4; CaptioningHead/LSTM_DSA.py:189-336).

    Per decode step: [h; query] predicts per-head deformable sampling
    offsets around the event's (center, length) reference box; the
    n_levels·n_points clip features sampled from the encoder memory are
    pooled by additive (Bahdanau) attention conditioned on h (LSTM_DSA.py
    :246-259 ctx2att/h2att/alpha_net), and [word; pooled; query] feeds the
    LSTM (:261-263, wordRNN_input_feats_type 'EC')."""

    vocab_size: int
    d_model: int = 256
    word_dim: int = 256
    rnn_size: int = 512
    att_hid: int = 512
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    max_caption_len: int = 20

    def setup(self):
        H, L, P = self.n_heads, self.n_levels, self.n_points

        def offset_bias_init(key, shape, dtype=jnp.float32):
            # alternating ±(i+1) directions (ms_deform_attn.py:63-71, 1-D)
            thetas = jnp.arange(H, dtype=jnp.float32) * (2 * math.pi / H)
            grid = jnp.cos(thetas)
            grid = grid / jnp.max(jnp.abs(grid))
            grid = jnp.tile(grid[:, None, None], (1, L, P))
            grid = grid * (jnp.arange(1, P + 1, dtype=jnp.float32))[None, None]
            return grid.reshape(-1).astype(dtype)

        self.word_embed = nn.Embed(self.vocab_size, self.word_dim)
        self.cell = nn.OptimizedLSTMCell(self.rnn_size)
        self.logit = nn.Dense(self.vocab_size)
        self.value_proj = nn.Dense(self.d_model, name="value_proj")
        self.offset_proj = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=offset_bias_init, name="sampling_offsets")
        self.ctx2att = nn.Dense(self.att_hid)
        self.h2att = nn.Dense(self.att_hid)
        self.alpha_net = nn.Dense(1)

    def _pool(self, h, query, refs, value, shapes):
        """Deformable sample + additive attention → (N, d_model).
        h (N, R); query (N, C); refs (N, 2) (center, length) in [0, 1];
        value (N, S, H, dh) projected memory; shapes static lengths."""
        from ...ops.deform_attn import _linear_sample_1d

        N = query.shape[0]
        H, L, P = self.n_heads, self.n_levels, self.n_points
        dh = self.d_model // H
        joint = jnp.concatenate([h, query], axis=-1)
        offsets = self.offset_proj(joint).reshape(N, H, L, P)
        # points spread across the event span (deform_attn.py box form)
        loc = (refs[:, None, None, None, 0]
               + offsets / P * refs[:, None, None, None, 1] * 0.5)
        start = 0
        sampled = []
        for l, T in enumerate(shapes):
            v = value[:, start : start + T]                  # (N, T, H, dh)
            v = v.transpose(0, 2, 1, 3).reshape(N * H, T, dh)
            s = _linear_sample_1d(v, loc[:, :, l].reshape(N * H, 1, P))
            sampled.append(s.reshape(N, H, P, dh))
            start += T
        sampled = jnp.concatenate(sampled, axis=2)           # (N, H, L·P, dh)
        att = jnp.tanh(self.ctx2att(sampled)
                       + self.h2att(h)[:, None, None])
        w = jax.nn.softmax(self.alpha_net(att)[..., 0], axis=-1)
        pooled = jnp.sum(sampled * w[..., None], axis=2)     # (N, H, dh)
        return pooled.reshape(N, self.d_model)

    def _value(self, memory):
        N, S, _ = memory.shape
        H = self.n_heads
        return self.value_proj(memory).reshape(N, S, H, self.d_model // H)

    def __call__(self, query_feats, captions, refs, memory, shapes):
        """Teacher-forced logits. query_feats (N, C); captions (N, Lc);
        refs (N, 2); memory (N, S, C) per-event encoder memory rows;
        shapes: static per-level lengths (pdvc_level_shapes)."""
        N, Lc = captions.shape
        value = self._value(memory)
        carry = (jnp.zeros((N, self.rnn_size)), jnp.zeros((N, self.rnn_size)))
        words = self.word_embed(captions)
        outs = []
        for t in range(Lc):
            pooled = self._pool(carry[1], query_feats, refs, value, shapes)
            inp = jnp.concatenate([words[:, t], pooled, query_feats], -1)
            carry, out = self.cell(carry, inp)
            outs.append(out)
        return self.logit(jnp.stack(outs, axis=1))

    def decode_greedy(self, query_feats, refs, memory, shapes,
                      bos: int = 0):
        N = query_feats.shape[0]
        value = self._value(memory)
        carry = (jnp.zeros((N, self.rnn_size)), jnp.zeros((N, self.rnn_size)))
        tok = jnp.full((N,), bos, jnp.int32)
        toks, lps = [], []
        for _ in range(self.max_caption_len):
            pooled = self._pool(carry[1], query_feats, refs, value, shapes)
            inp = jnp.concatenate([self.word_embed(tok), pooled,
                                   query_feats], -1)
            carry, out = self.cell(carry, inp)
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
    caption_decoder_type: str = "light"  # 'light' = plain LSTM head
                                         # (anet_c3d_pdvcl.yml); 'standard' =
                                         # LSTM-DSA (anet_c3d_pdvc.yml:4)

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
        if self.caption_decoder_type == "standard":
            self.caption_head = DSACaptioner(
                vocab_size=self.vocab_size, d_model=self.d_model,
                n_levels=self.n_levels,
                max_caption_len=self.max_caption_len, name="caption_head",
            )
        elif self.caption_decoder_type == "none":
            # proposal-only training (anet_c3d_props.yml, opts.py:224)
            self.caption_head = None
        else:
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
        out["memory"] = memory          # (B, ΣT_l, C) — the DSA caption
        return out                      # head samples from it per step

    def level_shapes(self, T: int):
        return pdvc_level_shapes(T, self.n_levels)

    def caption_logits(self, query_feats, captions, refs=None, memory=None,
                       shapes=None):
        """Teacher-forced caption logits for matched queries.
        query_feats (N, C), captions (N, L); for the 'standard' (DSA) head
        also refs (N, 2), per-event memory rows (N, S, C) and the static
        level shapes."""
        if self.caption_decoder_type == "standard":
            return self.caption_head(query_feats, captions, refs, memory,
                                     shapes)
        return self.caption_head(query_feats, captions)

    def init_all(self, feats, mask):
        """Initialization entry touching every submodule (the caption head is
        only reachable via its own methods)."""
        out = self(feats, mask)
        if self.caption_head is None:
            return out
        qf = out["query_feats"].reshape(-1, self.d_model)
        dummy = jnp.zeros((qf.shape[0], 2), jnp.int32)
        if self.caption_decoder_type == "standard":
            B, Q = out["query_feats"].shape[:2]
            refs = out["pred_boxes"].reshape(B * Q, 2)
            mem = jnp.repeat(out["memory"], Q, axis=0)
            self.caption_head(qf, dummy, refs, mem,
                              self.level_shapes(feats.shape[1]))
        else:
            self.caption_head(qf, dummy)
        return out

    def caption_greedy(self, query_feats, refs=None, memory=None,
                       shapes=None):
        if self.caption_decoder_type == "standard":
            return self.caption_head.decode_greedy(query_feats, refs, memory,
                                                   shapes)
        return self.caption_head.decode_greedy(query_feats)
