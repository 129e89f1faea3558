"""ViViM: pure vision-Mamba video backbone (middle cls token).

Reference: /root/reference/video-mamba-suite/egocentric-understanding/
avion/models/vimamba.py:231-502 (identical model in
action-recognition/models/vivim.py:229-560): patch embed per frame, cls token
inserted at the *middle* patch position, abs pos embed + per-frame temporal
embed, flattened (frames·tokens) sequence through ViM blocks (optionally
interleaved forward/backward layer pairs, vimamba.py:429-449), final norm,
mean over per-frame cls positions, optional projection.

Registered sizes (vivim.py:503-560): tiny d192/24L, small d384/24L.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fused_add_norm
from .common import DropPath, PatchifyConv
from .mamba import MambaVim, MambaScanNorm


class _ViViMScanBody(nn.Module):
    """nn.scan adapter stacking ViViM blocks into one compiled body (HLO
    O(1) in depth — required for 24-layer models under the tunneled
    remote-compile size limit). Carry is (hidden, residual); drop-path rate
    is shared across layers in this mode."""

    embed_dim: int
    rms_norm: bool
    norm_eps: float
    if_devide_out: bool
    impl: str
    drop_path: float
    deterministic: bool
    mixer: str = "vim"   # "vim" | "scan_norm" (vivim_scan_norm.py variants)
    d_state: int = 16    # SSM state size (the hs4 model-zoo variant uses 4)
    dual_stream: bool = False  # carry n batch streams and apply the shared-
                         # param block to each sequentially — the phase-
                         # shifted schedule (models/timemamba.py
                         # _BlockScanBody.dual_stream): each stream's scan
                         # (VPU) sits program-adjacent to the other streams'
                         # projection matmuls (MXU)

    @nn.compact
    def __call__(self, carry, _):
        streams = carry if self.dual_stream else (carry,)
        w = self.param("norm_w", nn.initializers.ones,
                       (self.embed_dim,), jnp.float32)
        b = (None if self.rms_norm
             else self.param("norm_b", nn.initializers.zeros,
                             (self.embed_dim,), jnp.float32))
        dp = (DropPath(rate=self.drop_path, name="dp")
              if self.drop_path > 0 else None)
        mcls = MambaScanNorm if self.mixer == "scan_norm" else MambaVim
        mixer = mcls(
            d_model=self.embed_dim, d_state=self.d_state,
            if_devide_out=self.if_devide_out,
            impl=self.impl, name="mixer",
        )
        out = []
        for hidden, residual in streams:
            h_in = dp(hidden, deterministic=self.deterministic) \
                if dp is not None else hidden
            h, res = fused_add_norm(
                h_in, w, b, residual=residual, prenorm=True,
                eps=self.norm_eps, is_rms_norm=self.rms_norm,
            )
            out.append((mixer(h), res))
        streams = tuple(out)
        return (streams if self.dual_stream else streams[0]), None


class PatchEmbed(nn.Module):
    """Conv2d patchifier: (B, H, W, C) → (B, N, D)."""

    patch_size: int = 16
    embed_dim: int = 192

    @nn.compact
    def __call__(self, x):
        x = PatchifyConv(
            self.embed_dim, patch_size=self.patch_size, name="proj",
        )(x)
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D)


class ViViM(nn.Module):
    """Input (B, T, H, W, C) videos → (B, embed_dim or output_dim) features
    (cls_at_middle, mean over frames) or (B, num_classes) logits."""

    img_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    depth: int = 24
    embed_dim: int = 192
    num_classes: int = 0           # 0 ⇒ features only
    output_dim: Optional[int] = None
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    rms_norm: bool = False
    norm_eps: float = 1e-5
    if_devide_out: bool = True
    if_bidirectional: bool = False  # interleaved fwd/bwd layer pairs
    d_state: int = 16               # SSM state (CLIP_ViViM_tiny_hs4 uses 4,
                                    # model_clip.py:928)
    mixer: str = "vim"              # "vim" | "scan_norm" — the reference's
                                    # vivim_{tiny,small}_scan_norm variants
                                    # (action-recognition/models/
                                    # vivim_scan_norm.py:503-545) use the
                                    # RMSNorm(d_inner)-before-out_proj mixer
    scan_blocks: bool = False       # compile one block, loop depth times
    remat: bool = False             # rematerialize blocks under scan (grad
                                    # checkpointing; required to get the
                                    # 24-deep training step through the
                                    # remote-compile service)
    impl: str = "auto"
    dual_stream: Any = False        # phase-shifted multi-stream schedule
                                    # (True = 2 streams, an int = that many);
                                    # requires scan_blocks. Batches the
                                    # stream count does not divide (batch-1
                                    # eval, shape-probing init) fall back to
                                    # the numerically-identical single-stream
                                    # schedule with the SAME param tree

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, H, W, C = x.shape
        feat = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(
            x.reshape(B * T, H, W, C)
        )                                               # (BT, N, D)
        N = feat.shape[1]
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim),
        ).astype(feat.dtype)
        mid = N // 2
        feat = jnp.concatenate(
            [feat[:, :mid], jnp.tile(cls, (B * T, 1, 1)), feat[:, mid:]], axis=1
        )                                               # (BT, M, D)
        M = N + 1

        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, M, self.embed_dim),
        )
        feat = feat + pos.astype(feat.dtype)
        feat = feat.reshape(B, T, M, self.embed_dim)
        if self.num_frames > 1:
            temp = self.param(
                "temporal_embed", nn.initializers.zeros,
                (self.num_frames, 1, self.embed_dim),
            )
            feat = feat + temp[None, :T].astype(feat.dtype)
        hidden = feat.reshape(B, T * M, self.embed_dim)
        hidden = nn.Dropout(self.drop_rate)(hidden, deterministic=deterministic)

        dpr = [
            self.drop_path_rate * i / max(self.depth - 1, 1)
            for i in range(self.depth)
        ]
        inter_dpr = [0.0] + dpr
        residual = None

        def block(i, hidden, residual, flip=False):
            w = self.param(f"norm{i}_w", nn.initializers.ones,
                           (self.embed_dim,), jnp.float32)
            b = (
                None if self.rms_norm
                else self.param(f"norm{i}_b", nn.initializers.zeros,
                                (self.embed_dim,), jnp.float32)
            )
            h_in = DropPath(rate=inter_dpr[i], name=f"dp{i}")(
                hidden, deterministic=deterministic
            ) if inter_dpr[i] > 0 else hidden
            h, res = fused_add_norm(
                h_in, w, b, residual=residual, prenorm=True,
                eps=self.norm_eps, is_rms_norm=self.rms_norm,
            )
            if flip:
                h = jnp.flip(h, axis=1)
            mcls = MambaScanNorm if self.mixer == "scan_norm" else MambaVim
            out = mcls(
                d_model=self.embed_dim, d_state=self.d_state,
                if_devide_out=self.if_devide_out,
                impl=self.impl, name=f"mixer{i}",
            )(h)
            return out, res

        assert self.scan_blocks or not self.dual_stream, \
            "dual_stream requires scan_blocks"
        if self.scan_blocks:
            assert not self.if_bidirectional, "scan_blocks: unidirectional only"
            ns = 0
            if self.dual_stream:
                ns = 2 if self.dual_stream is True else int(self.dual_stream)
                assert ns >= 2, "dual_stream needs a stream count >= 2"
                if B % ns != 0:
                    ns = 0  # single-stream fallback, same param tree
            if self.remat:
                # targeted policy: keep the Pallas scan outputs across the
                # remat boundary so the bwd skips re-running the fwd scan
                # kernels (measured +4% train step on TimeMamba-B; the
                # names are attached in ops/mamba_inner.py)
                body = nn.remat(
                    _ViViMScanBody,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "mamba_scan_out"))
            else:
                body = _ViViMScanBody
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
            )(
                embed_dim=self.embed_dim, rms_norm=self.rms_norm,
                norm_eps=self.norm_eps, if_devide_out=self.if_devide_out,
                impl=self.impl, drop_path=self.drop_path_rate,
                deterministic=deterministic, mixer=self.mixer,
                d_state=self.d_state, dual_stream=bool(ns), name="blocks",
            )
            res0 = jnp.zeros_like(hidden, jnp.float32)
            if ns:
                h = B // ns
                carry = tuple(
                    (hidden[i * h:(i + 1) * h], res0[i * h:(i + 1) * h])
                    for i in range(ns))
                streams, _ = scanned(carry, None)
                hidden = jnp.concatenate([s[0] for s in streams], axis=0)
                residual = jnp.concatenate([s[1] for s in streams], axis=0)
            else:
                (hidden, residual), _ = scanned((hidden, res0), None)
        elif not self.if_bidirectional:
            for i in range(self.depth):
                hidden, residual = block(i, hidden, residual)
        else:
            # interleaved pairs (vimamba.py:429-449)
            for i in range(self.depth // 2):
                h_f, r_f = block(2 * i, hidden, residual)
                h_b, r_b = block(2 * i + 1, hidden, residual, flip=True)
                hidden = h_f + jnp.flip(h_b, axis=1)
                residual = r_f + (jnp.flip(r_b, axis=1) if r_b is not None else 0)

        wf = self.param("norm_f_w", nn.initializers.ones,
                        (self.embed_dim,), jnp.float32)
        bf = (
            None if self.rms_norm
            else self.param("norm_f_b", nn.initializers.zeros,
                            (self.embed_dim,), jnp.float32)
        )
        hidden, _ = fused_add_norm(
            hidden, wf, bf, residual=residual, prenorm=False,
            eps=self.norm_eps, is_rms_norm=self.rms_norm,
        )

        # mean over the per-frame middle cls positions (vimamba.py:475)
        cls_positions = jnp.arange(T) * M + mid
        feats = jnp.mean(hidden[:, cls_positions], axis=1)  # (B, D)

        if self.output_dim is not None:
            proj = self.param(
                "image_projection",
                nn.initializers.normal(self.embed_dim ** -0.5),
                (self.embed_dim, self.output_dim),
            )
            feats = feats @ proj.astype(feats.dtype)
        if self.num_classes > 0:
            feats = nn.Dense(self.num_classes, name="head")(feats)
        return feats


def vivim_tiny(**kw) -> ViViM:
    """vivim.py:503 — ViViM-T."""
    return ViViM(embed_dim=192, depth=24, **kw)


def vivim_small(**kw) -> ViViM:
    """vivim.py:545 — ViViM-S."""
    return ViViM(embed_dim=384, depth=24, **kw)
