"""CLIP dual encoder: video tower (TimeMamba / ViViM) × text transformer.

Reference: /root/reference/video-mamba-suite/egocentric-understanding/
avion/models/model_clip.py:46-107 (CLIP wrapper + logit scale), builders
CLIP_TimeMamba_like_timesformer (:721), CLIP_ViViM_{tiny,small} (:860, :1028);
avion/models/transformer.py:378-480 (CLIP text transformer: token+pos embed,
causal pre-LN blocks, ln_final, eot-token pooling).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import FusedMHA, PatchifyConv
from .timemamba import Mlp, TimeMamba
from .vivim import ViViM


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (transformer.py ResidualAttentionBlock).

    LayerNorm eps is 1e-5 (torch default, used by the reference text/image
    towers) — flax's 1e-6 default drifts ~1% per layer at CLIP's tiny
    (std 0.02) embedding scale (caught by tests/test_tower_parity.py).
    """

    width: int
    heads: int
    causal: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + FusedMHA(
            num_heads=self.heads, causal=self.causal, name="attn",
        )(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        x = x + Mlp(4 * self.width, self.width, name="mlp")(
            h, deterministic=deterministic
        )
        return x


class TextTransformer(nn.Module):
    """CLIP text tower (transformer.py:378-480)."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    output_dim: Optional[int] = 512
    causal_mask: bool = True

    @nn.compact
    def __call__(self, text, deterministic: bool = True,
                 return_tokens: bool = False):
        """text (B, L) int32 token ids → (B, output_dim). Pooled at the
        argmax (eot) token as CLIP does; with return_tokens=True the
        per-token ln_final hidden states (B, L, width) come back instead —
        the `last_hidden_state` the reference's VTG demo extractor uses for
        query features (run_on_video/data_utils.py:43-48)."""
        x = nn.Embed(
            self.vocab_size, self.width,
            embedding_init=nn.initializers.normal(0.02), name="token_embedding",
        )(text)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[: x.shape[1]].astype(x.dtype)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, causal=self.causal_mask,
                name=f"resblock{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        if return_tokens:
            return x
        eot = jnp.argmax(text, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        if self.output_dim is not None:
            proj = self.param(
                "text_projection", nn.initializers.normal(self.width ** -0.5),
                (self.width, self.output_dim),
            )
            x = x @ proj.astype(x.dtype)
        return x


class ClipImageTower(nn.Module):
    """Standard CLIP ViT IMAGE encoder (per-frame, no temporal mixing) — the
    frozen feature extractor the reference's VTG demo pipeline uses
    (video-temporal-grounding/run_on_video/clip_feature_extractor.py:17-23,
    ViT-B/32). Reuses the text tower's ResidualAttentionBlock (causal=False).
    """

    img_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: Optional[int] = 512

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x (B, H, W, 3) → (B, output_dim)."""
        B = x.shape[0]
        p = self.patch_size
        feat = PatchifyConv(self.width, patch_size=p,
                            use_bias=False, name="conv1")(x)
        feat = feat.reshape(B, -1, self.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        feat = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)).astype(feat.dtype),
             feat], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (feat.shape[1], self.width))
        feat = feat + pos.astype(feat.dtype)
        feat = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(feat)
        for i in range(self.layers):
            feat = ResidualAttentionBlock(
                self.width, self.heads, causal=False, name=f"resblock{i}",
            )(feat, deterministic=deterministic)
        feat = nn.LayerNorm(epsilon=1e-5, name="ln_post")(feat[:, 0])
        if self.output_dim is not None:
            proj = self.param("proj",
                              nn.initializers.normal(self.width ** -0.5),
                              (self.width, self.output_dim))
            feat = feat @ proj.astype(feat.dtype)
        return feat


class CLIP(nn.Module):
    """Dual encoder with learnable temperature (model_clip.py:46-105).

    `vision_cfg`: dict of tower kwargs; `vision_tower`: 'timemamba' | 'vivim'.
    Towers project to embed_dim internally (output_dim=embed_dim).
    """

    embed_dim: int = 512
    vision_tower: str = "timemamba"
    vision_cfg: Any = None
    text_cfg: Any = None
    freeze_temperature: bool = False

    def setup(self):
        vc = dict(self.vision_cfg or {})
        vc.setdefault("output_dim", self.embed_dim)
        if self.vision_tower == "timemamba":
            self.visual = TimeMamba(**vc, name="visual")
        elif self.vision_tower == "vivim":
            self.visual = ViViM(**vc, name="visual")
        else:
            raise ValueError(self.vision_tower)
        tc = dict(self.text_cfg or {})
        tc.setdefault("output_dim", self.embed_dim)
        self.textual = TextTransformer(**tc, name="textual")
        self.logit_scale = self.param(
            "logit_scale",
            lambda k, s: jnp.full(s, math.log(1 / 0.07), jnp.float32), (),
        )

    def encode_image(self, image, deterministic: bool = True):
        return self.visual(image, deterministic=deterministic)

    def encode_text(self, text, deterministic: bool = True):
        return self.textual(text, deterministic=deterministic)

    def __call__(self, image, text, deterministic: bool = True):
        img = self.encode_image(image, deterministic)
        txt = self.encode_text(text, deterministic)
        img = img / jnp.maximum(
            jnp.linalg.norm(img, axis=-1, keepdims=True), 1e-8
        )
        txt = txt / jnp.maximum(
            jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-8
        )
        scale = jnp.exp(self.logit_scale)
        if self.freeze_temperature:
            scale = jax.lax.stop_gradient(scale)
        return img, txt, scale


def clip_timemamba_base(num_frames: int = 4, project_embed_dim: int = 512,
                        **kw) -> CLIP:
    """CLIP_TimeMamba_like_timesformer (model_clip.py:721): ViT-B/16 spatial
    tower with Mamba time adapters + CLIP text-B. The reference builder sets
    attention_style='timesformer-div' and is_tanh_gating=True (:729-737)."""
    cfg = dict(
        embed_dim=768, depth=12, num_heads=12, num_frames=num_frames,
        ln_pre=True, attention_style="timesformer-div", is_tanh_gating=True,
    )
    cfg.update(kw)
    return CLIP(
        embed_dim=project_embed_dim,
        vision_tower="timemamba",
        vision_cfg=cfg,
        text_cfg=dict(width=512, heads=8, layers=12),
    )


def clip_timemamba_frozen(num_frames: int = 4, project_embed_dim: int = 512,
                          **kw) -> CLIP:
    """CLIP_TimeMamba_like_frozen (model_clip.py:767): frozen-in-time
    residual style + tanh-gated temporal adapters — the MODEL_ZOO
    'TimeMamba-B (Frozen)' zero-shot MIR row."""
    return clip_timemamba_base(
        num_frames, project_embed_dim,
        attention_style="frozen-in-time", **kw)


def clip_timemamba_frozen_joint(num_frames: int = 4,
                                project_embed_dim: int = 512, **kw) -> CLIP:
    """CLIP_TimeMamba_like_frozen_joint (model_clip.py:813): the temporal
    Mamba scans the JOINT (n·t) token sequence."""
    return clip_timemamba_base(
        num_frames, project_embed_dim,
        attention_style="frozen-joint", **kw)


def clip_vivim_tiny(num_frames: int = 16, project_embed_dim: int = 512) -> CLIP:
    """CLIP_ViViM_tiny (model_clip.py:860)."""
    return CLIP(
        embed_dim=project_embed_dim,
        vision_tower="vivim",
        vision_cfg=dict(embed_dim=192, depth=24, num_frames=num_frames,
                        if_devide_out=True),
        text_cfg=dict(width=512, heads=8, layers=12),
    )


def clip_vivim_tiny_hs4(num_frames: int = 16,
                        project_embed_dim: int = 512) -> CLIP:
    """CLIP_ViViM_tiny_hs4 (model_clip.py:928): d_state = 4 variant."""
    return CLIP(
        embed_dim=project_embed_dim,
        vision_tower="vivim",
        vision_cfg=dict(embed_dim=192, depth=24, num_frames=num_frames,
                        if_devide_out=True, d_state=4),
        text_cfg=dict(width=512, heads=8, layers=12),
    )


def clip_vivim_small(num_frames: int = 16, project_embed_dim: int = 512) -> CLIP:
    """CLIP_ViViM_small (model_clip.py:1028)."""
    return CLIP(
        embed_dim=project_embed_dim,
        vision_tower="vivim",
        vision_cfg=dict(embed_dim=384, depth=24, num_frames=num_frames,
                        if_devide_out=True),
        text_cfg=dict(width=512, heads=8, layers=12),
    )
