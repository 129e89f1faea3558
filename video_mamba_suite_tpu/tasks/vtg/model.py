"""UniVTG-Mamba: cross-modal grounding model.

Reference: /root/reference/video-mamba-suite/video-temporal-grounding/model/
univtg_mamba.py — LinearLayer input projections (:616-640), token-type
embeddings, concat [txt; vid] (:301-330), a stack of Mamba Blocks where the
per-layer *position embedding is added after the fused add-norm, before the
mixer* (:144-146), final fused norm (:345-365), Conv heads for foreground
logits (sigmoid) and span offsets (sigmoid · (−1, 1)) (:367-378), WeightedPool
sentence pooling and cosine saliency (:176-190, :380-387).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.common import DropPath, sinusoid_positions
from ...models.mamba import MambaDBM, MambaVim
from ...ops import fused_add_norm, layer_norm


class LinearLayer(nn.Module):
    """LN → dropout → linear (→ relu) (univtg_mamba.py:616-640)."""

    out_dim: int
    use_ln: bool = True
    dropout: float = 0.0
    relu: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.use_ln:
            x = nn.LayerNorm()(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim)(x)
        return nn.relu(x) if self.relu else x


class ConvHead(nn.Module):
    """3-layer conv1d head (univtg_mamba.py Conv, :597-614)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Conv(out, (self.kernel_size,), padding="SAME")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class WeightedPool(nn.Module):
    """Masked attention pooling (univtg_mamba.py:176-190)."""

    dim: int

    @nn.compact
    def __call__(self, x, mask):
        w = self.param(
            "weight", nn.initializers.xavier_uniform(), (self.dim, 1), jnp.float32
        )
        alpha = jnp.einsum("bld,do->blo", x.astype(jnp.float32), w)
        alpha = jnp.where(mask[..., None] > 0, alpha, -1e30)
        alphas = jax.nn.softmax(alpha, axis=1)
        return jnp.einsum("bld,blo->bd", x.astype(jnp.float32), alphas)


class UniVTGMamba(nn.Module):
    txt_dim: int
    vid_dim: int
    embed_dim: int = 1024
    depth: int = 6
    n_input_proj: int = 2
    input_dropout: float = 0.5
    drop_path_rate: float = 0.1
    mamba_type: str = "vim"     # 'vim' | 'dbm'
    if_rope: bool = False       # rotary positions per layer (model/rope.py)
    norm_eps: float = 1e-5
    impl: str = "auto"

    @nn.compact
    def __call__(self, src_txt, src_txt_mask, src_vid, src_vid_mask,
                 src_cls=None, src_cls_mask=None, deterministic: bool = True):
        """txt (B, Lt, Dt), vid (B, Lv, Dv), masks (B, L) → out dict.

        src_cls/src_cls_mask: optional class-name token features (the VLP
        zero-shot TAL path, univtg_mamba.py:306-317,382-384): projected by
        the text projector and weighted-pooled into out['cls_mem_proj'] —
        they do NOT enter the encoder."""
        relu_args = [True] * 3
        relu_args[self.n_input_proj - 1] = False

        def make_proj(name):
            layers = [
                LinearLayer(
                    self.embed_dim, use_ln=True, dropout=self.input_dropout,
                    relu=relu_args[i], name=f"{name}{i}",
                )
                for i in range(self.n_input_proj)
            ]

            def apply(x):
                for layer in layers:
                    x = layer(x, deterministic=deterministic)
                return x

            return apply

        vid_projector = make_proj("vid_proj")
        txt_projector = make_proj("txt_proj")
        vid = vid_projector(src_vid)
        txt = txt_projector(src_txt)

        type_emb = nn.Embed(2, self.embed_dim, name="token_type")(
            jnp.concatenate(
                [jnp.zeros_like(src_txt_mask, jnp.int32),
                 jnp.ones_like(src_vid_mask, jnp.int32)], axis=1,
            )
        )
        hidden = jnp.concatenate([txt, vid], axis=1) + type_emb
        mask = jnp.concatenate([src_txt_mask, src_vid_mask], axis=1)

        # positions: zeros for text, sinusoid over video clips (:324-330)
        Lt, Lv = txt.shape[1], vid.shape[1]
        pos_vid = sinusoid_positions(Lv, self.embed_dim)[None]
        pos = jnp.concatenate(
            [jnp.zeros((1, Lt, self.embed_dim), jnp.float32), pos_vid], axis=1
        ).astype(hidden.dtype)

        dpr = [self.drop_path_rate] * self.depth
        inter_dpr = [0.0] + dpr
        residual = None
        mixer_cls = MambaVim if self.mamba_type == "vim" else MambaDBM
        mixer_kw = dict(d_model=self.embed_dim, impl=self.impl)
        if self.mamba_type == "dbm":
            mixer_kw["expand"] = 1
        for i in range(self.depth):
            w = self.param(f"norm{i}_w", nn.initializers.ones,
                           (self.embed_dim,), jnp.float32)
            b = self.param(f"norm{i}_b", nn.initializers.zeros,
                           (self.embed_dim,), jnp.float32)
            h_in = (
                DropPath(rate=inter_dpr[i], name=f"dp{i}")(
                    hidden, deterministic=deterministic)
                if i > 0 else hidden
            )
            if self.if_rope:
                from ...models.rope import rope_rotate

                h_in = rope_rotate(h_in)
            h, residual = fused_add_norm(
                h_in, w, b, residual=residual, prenorm=True,
                eps=self.norm_eps,
            )
            h = h + pos  # per-layer position injection (:144-146)
            hidden = mixer_cls(**mixer_kw, name=f"mixer{i}")(h, mask)
        wf = self.param("norm_f_w", nn.initializers.ones,
                        (self.embed_dim,), jnp.float32)
        bf = self.param("norm_f_b", nn.initializers.zeros,
                        (self.embed_dim,), jnp.float32)
        hidden, _ = fused_add_norm(
            hidden, wf, bf, residual=residual, prenorm=False, eps=self.norm_eps
        )

        vid_mem = hidden[:, Lt : Lt + Lv]
        class_prob = jax.nn.sigmoid(
            ConvHead(self.embed_dim, 1, name="class_embed")(vid_mem)
        )
        coord = jax.nn.sigmoid(
            ConvHead(self.embed_dim, 2, name="span_embed")(vid_mem)
        )
        pred_spans = coord * jnp.asarray([-1.0, 1.0])[None, None]

        wpool = WeightedPool(self.embed_dim, name="weightedpool")
        txt_pool = wpool(txt, src_txt_mask)[:, None]   # (B, 1, D)
        vid_proj = vid                                  # pre-encoder (:380)
        sim = _cosine(vid_proj, txt_pool) + jnp.where(
            src_vid_mask > 0, 0.0, -1e4
        )
        out = dict(
            pred_logits=class_prob, pred_spans=pred_spans,
            src_vid_mask=src_vid_mask, vid_mem_proj=vid_proj,
            txt_mem_proj=txt_pool, saliency_scores=sim,
        )
        if src_cls is not None:
            cls = txt_projector(src_cls)  # shared text projector + pool
            out["cls_mem_proj"] = wpool(cls, src_cls_mask)
        return out


def _safe_norm(x, axis=-1, eps=1e-8):
    """sqrt(Σx² + eps): finite gradient at x = 0 (jnp.linalg.norm's grad is
    NaN at exactly-zero rows, which padded positions produce)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def _cosine(a, b):
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    num = jnp.sum(af * bf, axis=-1)
    return num / (_safe_norm(af) * _safe_norm(bf))
