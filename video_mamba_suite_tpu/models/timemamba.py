"""TimeMamba: CLIP-ViT with Mamba temporal adapters (TimeSformer-style).

Reference: /root/reference/video-mamba-suite/egocentric-understanding/
avion/models/timemamba.py — SpaceTimeBlock (:98-178): per patch position a
ViM Mamba (expand=1) mixes over time, then spatial MHA over patches within
each frame (cls token broadcast per frame and averaged back), then MLP;
TimeMamba backbone (:180-434): per-frame patch embed, shared spatial pos
embed, token layout (B, 1 + N·T, D) with cls first and patch-major
(n t) time-minor ordering, 'frozen-in-time' residual style.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import FusedMHA, PatchifyConv, make_dense
from .mamba import MambaVim


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = None   # compute dtype (bf16 policy); params stay fp32
    quant: bool = False  # w8a8 serving mode (common.QuantDense)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = make_dense(self.hidden, quant=self.quant, dtype=self.dtype,
                       name="fc1")(x)
        # named for targeted remat: saving the fc1 pre-activation skips the
        # MLP's big matmul recompute in the bwd (gelu recompute stays cheap)
        from jax.ad_checkpoint import checkpoint_name

        x = checkpoint_name(x, "mlp_fc1")
        # exact-erf gelu (torch nn.GELU default, timemamba.py:52) in fp32;
        # under the bf16 policy the tanh form is used instead — its max
        # error (~1e-3·|x|) sits below one bf16 ulp (8e-3·|x|), i.e. the
        # same function at compute precision, and erf costs ~10 ms/fwd of
        # VPU time at TimeMamba-B scale (measured: 79.2 → 70.2 ms on the
        # 12-layer spatial stack). fp32 paths (parity tests) stay exact.
        x = nn.gelu(x, approximate=self.dtype == jnp.bfloat16)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = make_dense(self.out, quant=self.quant, dtype=self.dtype,
                       name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class SpaceTimeBlock(nn.Module):
    """timemamba.py:98-178, attention_style='frozen-in-time'.

    The cls token and the patch grid travel as SEPARATE tensors
    (cls (B, 1, D), patches (B, n, t, D) patch-major): the reference's
    single [cls; (n t)] sequence forces two full-tensor concat/slice copies
    per block; keeping them apart is the same math with zero copies, and
    the (B, n, t, D) layout feeds the temporal scan with a free reshape.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    is_tanh_gating: bool = False
    attention_style: str = "frozen-in-time"  # | "timesformer-div" |
                         # "frozen-joint" (timemamba.py:102,136,168-171):
                         # frozen-in-time — temporal output feeds attention
                         # only, residual from the block input; timesformer-
                         # div — the temporal residual STAYS in the stream;
                         # frozen-joint — the Mamba scans the JOINT (n·t)
                         # sequence instead of per-patch time
    impl: str = "auto"
    attn_flash: Any = None  # spatial-attention kernel: None = XLA einsum
                         # (the measured-best default in context); "row" =
                         # head-major packed-qkv whole-row Pallas kernel
                         # (ops/vision_attention.row_mha_qkv — 1.13x on the
                         # isolated sandwich but neutral in the full fwd and
                         # slower in training; benchmarks/r{8,9}_*.py)
    dtype: Any = None
    quant: Any = False   # w8a8 serving mode: True = all block projections,
                         # "mlp" = MLP fc1/fc2 only (the only site where
                         # int8 wins end-to-end at TimeMamba-B scale —
                         # BASELINE.md round-3/4 serving notes)
    ring_mesh: Any = None  # sequence-parallel temporal Mamba: shard the
    ring_axes: Any = ("data", "seq")  # frame axis t over ring_axes[1]
                         # (ppermute prefix rings; see models.MambaVim)

    @nn.compact
    def __call__(self, cls, patches, deterministic: bool = True):
        """cls (B, 1, D); patches (B, n, t, D). Returns (cls, patches)."""
        B, n, t, D = patches.shape

        if self.attention_style == "frozen-joint":
            # temporal Mamba over the JOINT patch-major (n t) sequence
            # (timemamba.py:136 keeps b (n t) d when frozen-joint)
            assert self.ring_mesh is None, \
                "frozen-joint scans (n·t); ring mode shards t only"
            ht = patches.reshape(B, n * t, D)
        else:
            # --- temporal Mamba per patch position (:130-141)
            ht = patches.reshape(B * n, t, D)
        ht_n = nn.LayerNorm(dtype=self.dtype, name="norm3")(ht)
        time_out = MambaVim(d_model=D, expand=1, impl=self.impl,
                            dtype=self.dtype, quant=self.quant is True,
                            ring_mesh=self.ring_mesh,
                            ring_axes=tuple(self.ring_axes),
                            name="time_mamba")(ht_n)
        if self.is_tanh_gating:
            alpha = self.param("alpha_timeattn", nn.initializers.zeros, ())
            # cast the fp32 gate to the compute dtype: the product otherwise
            # promotes the temporal residual to fp32, which under
            # timesformer-div enters the nn.scan carry and breaks the bf16
            # policy (and costs ~20 ms/fwd of fp32 stream, round-2 notes)
            time_out = jnp.tanh(alpha).astype(time_out.dtype) * time_out
        time_residual = ht + time_out            # (B·n, t, D) or (B, n·t, D)
        tr = time_residual.reshape(B, n, t, D)

        # --- spatial attention per frame with broadcast cls (:148-170).
        # Stays in the patch-major (B, 1+n, t, D) layout: FusedMHA's
        # seq_axis=1 path batches the attention over (B, t) directly, so
        # the (B·t, n, D) flatten/unflatten transposes (and XLA's resulting
        # layout copies, ~4 ms/fwd at TimeMamba-B) never materialize
        # (benchmarks/r5_attn_layout.py)
        cls4 = jnp.broadcast_to(
            cls.astype(patches.dtype)[:, :, None], (B, 1, t, D))
        xs = jnp.concatenate([cls4, tr], axis=1)         # (B, 1+n, t, D)
        xs_n = nn.LayerNorm(dtype=self.dtype, name="norm1")(xs)
        space_out = FusedMHA(num_heads=self.num_heads, dtype=self.dtype,
                             quant=self.quant is True, seq_axis=1,
                             flash=self.attn_flash,
                             name="attn")(xs_n, deterministic=deterministic)
        cls_out = space_out[:, 0].mean(axis=1, keepdims=True)   # (B, 1, D)
        patch_out = space_out[:, 1:]                     # (B, n, t, D)

        # residual style (:168-171): frozen-in-time/joint add the space
        # branch to the BLOCK INPUT; timesformer-div adds it to the
        # temporal residual (divided space-time)
        cls = cls + cls_out
        if self.attention_style == "timesformer-div":
            patches = tr + patch_out
        else:
            patches = patches + patch_out
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        mlp = Mlp(int(D * self.mlp_ratio), D, self.drop,
                  dtype=self.dtype,
                  quant=self.quant in (True, "mlp"), name="mlp")
        mlp_cls = mlp(norm2(cls), deterministic=deterministic)
        mlp_patch = mlp(norm2(patches), deterministic=deterministic)
        if deterministic or self.drop_path == 0.0:
            cls = cls + mlp_cls
            patches = patches + mlp_patch
        else:
            # ONE stochastic-depth decision per sample for the whole branch
            # (cls and patches together, as in the joint-tensor form)
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (B, 1, 1))
            cls = cls + jnp.where(mask, mlp_cls / keep, 0.0)
            patches = patches + jnp.where(mask[..., None],
                                          mlp_patch / keep, 0.0)
        return cls, patches


class _BlockScanBody(nn.Module):
    """nn.scan adapter: stacks `depth` SpaceTimeBlocks into one compiled
    block body (an XLA While loop). Keeps the HLO size O(1) in depth —
    essential for deep models (the remote-compile service rejects unrolled
    12-block programs). Uses one shared drop_path rate across layers
    (instead of the unrolled path's linspace schedule)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    drop: float
    drop_path: float
    is_tanh_gating: bool
    attention_style: str
    impl: str
    deterministic: bool
    attn_flash: Any = None
    dtype: Any = None
    quant: Any = False
    ring_mesh: Any = None
    ring_axes: Any = ("data", "seq")
    group: int = 1   # blocks per scan step (HLO is O(group); larger groups
                     # amortize the while-loop carry copies — profiled at
                     # ~4.5 ms/block of pure copy/add overhead at group=1)
    dual_stream: Any = False   # carry two half-batch streams and apply the
                     # (shared-param) block to each sequentially, so every
                     # MXU phase of one stream sits program-adjacent to an
                     # independent VPU (scan) phase of the other — the
                     # phase-shifted schedule probed by
                     # benchmarks/r11_dual_stream.py

    @nn.compact
    def __call__(self, carry, _):
        streams = carry if self.dual_stream else (carry,)
        out = []
        for gi in range(self.group):
            blk = SpaceTimeBlock(
                dim=self.dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop, drop_path=self.drop_path,
                is_tanh_gating=self.is_tanh_gating,
                attention_style=self.attention_style, impl=self.impl,
                attn_flash=self.attn_flash,
                dtype=self.dtype, quant=self.quant,
                ring_mesh=self.ring_mesh, ring_axes=self.ring_axes,
                name=f"block{gi}" if self.group > 1
                else "block",
            )
            out = [blk(cls, patches, deterministic=self.deterministic)
                   for cls, patches in streams]
            streams = tuple(out)
        return (streams if self.dual_stream else streams[0]), None


class TimeMamba(nn.Module):
    """Video encoder (timemamba.py:180-434). Input (B, T, H, W, C)."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_frames: int = 8
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ln_pre: bool = False            # CLIP-style pre-LN variant
    is_tanh_gating: bool = False
    attention_style: str = "frozen-in-time"
    output_dim: Optional[int] = 512
    scan_blocks: bool = False       # compile one block, loop `depth` times
    scan_group: int = 1             # blocks per scan step (must divide depth)
    remat: bool = False             # rematerialize blocks under scan (the
                                    # grad-checkpointing option, timemamba.py:366)
    remat_policy: Optional[str] = None  # name in jax.checkpoint_policies
                                    # (e.g. "dots_saveable": keep MXU outputs,
                                    # recompute only elementwise/norm work —
                                    # trades HBM for a much cheaper recompute)
    dtype: Any = None               # compute dtype (e.g. jnp.bfloat16)
    impl: str = "auto"
    attn_flash: Any = None          # spatial-attention kernel ("row" =
                                    # head-major whole-row Pallas kernel;
                                    # see SpaceTimeBlock.attn_flash)
    quant: Any = False              # w8a8 int8 serving mode, inference-only;
                                    # params & checkpoints unchanged.
                                    # True: all block projections (qkv/out,
                                    # MLP, Mamba in/out_proj). "mlp": MLP
                                    # fc1/fc2 only — the measured net-win
                                    # config (the smaller projections lose
                                    # more to the per-token quantize pass
                                    # than the int8 MXU saves).
    ring_mesh: Any = None           # composed data×sequence parallelism:
    ring_axes: Any = ("data", "seq")  # temporal adapters ring-scan over
                                    # ring_axes[1] (frame axis sharded);
                                    # spatial attention/MLP stay local
    dual_stream: Any = False        # phase-shifted multi-stream schedule
                                    # (see _BlockScanBody.dual_stream):
                                    # True = 2 streams, an int = that many;
                                    # requires scan_blocks and batch %
                                    # n_streams == 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, H, W, C = x.shape
        p = self.patch_size

        def _constrain(t, *spec):
            """Ring mode: pin shardings at the reshape boundaries where
            the batch ('data') and frame ('seq') axes merge/split — GSPMD's
            propagation otherwise all-gathers the frame axis there and
            computes the patch embed redundantly on every seq shard
            (observed in the compiled HLO; hlo_audit catches it)."""
            if self.ring_mesh is None or self.is_initializing():
                return t  # init runs on a single example (indivisible dims)
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.lax.with_sharding_constraint(
                t, NamedSharding(self.ring_mesh, PartitionSpec(*spec)))

        ba, sa = tuple(self.ring_axes)
        xf = _constrain(x.reshape(B * T, H, W, C), (ba, sa))
        feat = PatchifyConv(
            self.embed_dim, patch_size=p,
            use_bias=not self.ln_pre, dtype=self.dtype, name="patch_embed",
        )(xf)
        BT, hh, ww, D = feat.shape
        n = hh * ww
        feat = feat.reshape(BT, n, D)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, D)).astype(feat.dtype)
        feat = jnp.concatenate([jnp.tile(cls, (BT, 1, 1)), feat], axis=1)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n + 1, D))
        feat = feat + pos.astype(feat.dtype)

        # layout: batch-0 cls kept separate; patches (B, n, T, D) patch-major
        # (:357-362) — the joint [cls; (n t)] sequence is never materialized
        # (two full-tensor copies per block saved; see SpaceTimeBlock)
        if self.ring_mesh is None:
            cls_tokens = feat[:B, :1]
        else:
            # feat[:B, :1] ≡ cls + pos[:, :1] (the cls rows are concats of
            # the same two params, untouched by the conv) — construct it
            # directly: the slice's B rows all live on ONE shard of the
            # merged (B·T) axis, so slicing would force a broadcast.
            cls_tokens = jnp.broadcast_to(
                (cls + pos[:, :1].astype(feat.dtype))[0], (B, 1, D))
            cls_tokens = _constrain(cls_tokens, ba)
        patches = _constrain(
            feat[:, 1:].reshape(B, T, n, D).transpose(0, 2, 1, 3),
            ba, None, sa)
        if self.ln_pre:
            # dtype matters: without it LayerNorm returns fp32 and the WHOLE
            # residual stream (the nn.scan carry) runs in fp32 — profiled at
            # ~20 ms/fwd of fp32 norm fusions + copies at TimeMamba-B scale
            # (the reference's autocast casts LN outputs back to bf16)
            ln_pre = nn.LayerNorm(dtype=self.dtype, name="ln_pre")
            cls_tokens, patches = ln_pre(cls_tokens), ln_pre(patches)
        drop = nn.Dropout(self.drop_rate)
        cls_tokens = drop(cls_tokens, deterministic=deterministic)
        patches = drop(patches, deterministic=deterministic)

        if self.scan_blocks:
            assert self.depth % self.scan_group == 0, "scan_group ∤ depth"
            ns = 0
            if self.dual_stream:
                ns = 2 if self.dual_stream is True else int(self.dual_stream)
                assert ns >= 2 and self.ring_mesh is None, \
                    "dual_stream needs a stream count >= 2 and no ring mesh"
                if B % ns != 0:
                    # batches the stream count doesn't divide (batch-1 eval,
                    # shape-probing init) run the numerically-identical
                    # single-stream schedule; the param tree is unchanged
                    # (streams share the block params)
                    ns = 0
            if self.remat:
                if self.remat_policy == "save_scan":
                    # targeted: keep ONLY the Pallas scan outputs across the
                    # remat boundary (12 × 38.5 MB ≈ 0.46 GB ≈ 1 ms of HBM)
                    # so the bwd skips re-running the fwd scan kernels
                    # (~22 ms/step) — the coarse dots_saveable policy stores
                    # GBs of matmul outputs and measured slower (r3_exp8)
                    policy = jax.checkpoint_policies.save_only_these_names(
                        "mamba_scan_out")
                elif self.remat_policy == "save_scan_attn":
                    # + the attention softmax weights (119 MB/layer)
                    policy = jax.checkpoint_policies.save_only_these_names(
                        "mamba_scan_out", "attn_weights")
                elif self.remat_policy == "save_scan_fc1":
                    # + the MLP fc1 pre-activations (154 MB/layer)
                    policy = jax.checkpoint_policies.save_only_these_names(
                        "mamba_scan_out", "mlp_fc1")
                elif self.remat_policy:
                    policy = getattr(jax.checkpoint_policies,
                                     self.remat_policy)
                else:
                    policy = None
                body = nn.remat(_BlockScanBody, policy=policy)
            else:
                body = _BlockScanBody
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth // self.scan_group,
            )(
                dim=D, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                drop=self.drop_rate, drop_path=self.drop_path_rate,
                is_tanh_gating=self.is_tanh_gating,
                attention_style=self.attention_style, impl=self.impl,
                deterministic=deterministic, group=self.scan_group,
                attn_flash=self.attn_flash,
                dtype=self.dtype, quant=self.quant,
                ring_mesh=self.ring_mesh, ring_axes=self.ring_axes,
                dual_stream=bool(ns),
                name="blocks",
            )
            if ns:
                h = B // ns
                carry = tuple(
                    (cls_tokens[i * h:(i + 1) * h],
                     patches[i * h:(i + 1) * h]) for i in range(ns))
                streams, _ = scanned(carry, None)
                cls_tokens = jnp.concatenate(
                    [s[0] for s in streams], axis=0)
                patches = jnp.concatenate([s[1] for s in streams], axis=0)
            else:
                (cls_tokens, patches), _ = scanned(
                    (cls_tokens, patches), None)
        else:
            assert not self.dual_stream, "dual_stream requires scan_blocks"
            dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
                   for i in range(self.depth)]
            for i in range(self.depth):
                cls_tokens, patches = SpaceTimeBlock(
                    dim=D, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                    drop=self.drop_rate, drop_path=dpr[i],
                    is_tanh_gating=self.is_tanh_gating,
                    attention_style=self.attention_style, impl=self.impl,
                    attn_flash=self.attn_flash,
                    dtype=self.dtype, quant=self.quant,
                    ring_mesh=self.ring_mesh, ring_axes=self.ring_axes,
                    name=f"block{i}",
                )(cls_tokens, patches, deterministic=deterministic)

        h = nn.LayerNorm(name="norm")(cls_tokens)[:, 0]  # cls at last (:377)
        if self.output_dim is not None:
            proj = self.param(
                "image_projection",
                nn.initializers.normal(self.embed_dim ** -0.5),
                (self.embed_dim, self.output_dim),
            )
            h = h @ proj.astype(h.dtype)
        return h
