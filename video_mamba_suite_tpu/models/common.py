"""Shared model components for the task suites (time-major (B, L, C) layout).

TPU re-implementations of the building blocks the reference task suites share:
masked convs / LayerNorm / (Affine)DropPath (TAL libs/modeling/blocks.py),
MaskMambaBlock (blocks.py:901-976, also used by TAS), sliding-window local
attention (TAS model.py:133-171), sinusoidal positions, and MLP heads.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import layer_norm
from .mamba import MambaDBM, MambaVim, torch_linear_init


# ---------------------------------------------------------------------------
# quantized serving-mode projection


class QuantDense(nn.Module):
    """Drop-in nn.Dense with dynamic w8a8 int8 matmul (ops/quant.py).

    The parameter tree ('kernel' (in, out) fp32, optional 'bias') is
    IDENTICAL to nn.Dense, so bf16 checkpoints, weight porting and init
    schemes are unchanged — only the serving-mode matmul differs.
    Inference-only (gradients stop at the quantization).
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_matmul

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        out = int8_matmul(x, kernel, out_dtype=self.dtype or x.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            out = out + bias.astype(out.dtype)
        return out


def make_dense(features: int, *, quant: bool = False, **kw):
    """nn.Dense, or its w8a8 serving-mode drop-in when quant=True."""
    return (QuantDense if quant else nn.Dense)(features, **kw)


class W8Dense(nn.Dense):
    """nn.Dense that transparently consumes OFFLINE-quantized int8 kernels.

    Without a ``qscale`` collection this IS nn.Dense (same init, params,
    gradients). When apply() is given variables produced by
    ``models.quant_decode.quantize_lm_for_decode`` — the 'kernel' leaf
    replaced by int8 and a per-output-channel fp32 scale at the same module
    path in the 'qscale' collection — the matmul reads the int8 kernel
    (HALF the HBM weight stream, the decode-step bottleneck: BASELINE.md
    decode section) and applies the scale to the output. Unlike QuantDense
    (dynamic w8a8 from full-width master weights, which still streams fp32
    from HBM), this is the serving path where the stored bytes themselves
    are int8. Reference counterpart: none (the reference serves fp16);
    capability beyond mamba/benchmarks/benchmark_generation_mamba_simple.py.
    """

    def __call__(self, x):
        # NOT @nn.compact: the int8 branch only READS variables (apply-time,
        # post-quantization), and the fallback delegates to nn.Dense's own
        # compact __call__ for param declaration.
        if self.has_variable("qscale", "kernel"):
            kernel = self.get_variable("params", "kernel")   # int8 (in, out)
            s = self.get_variable("qscale", "kernel")        # (out,) f32
            y = jnp.dot(x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            y = y * s
            if self.use_bias:
                y = y + self.get_variable("params", "bias")
            return y.astype(self.dtype or x.dtype)
        return super().__call__(x)


class W8Embed(nn.Embed):
    """nn.Embed that transparently consumes an offline-quantized int8 table.

    With a ``qscale`` entry ('embedding' per-ROW fp32 scales, (vocab,)),
    the lookup gathers int8 rows and rescales; the same per-row scales
    rescale the weight-tied LM head's output columns
    (MambaLMHeadModel._logits). Without qscale this IS nn.Embed.
    """

    def __call__(self, inputs):
        if self.has_variable("qscale", "embedding"):
            s = self.get_variable("qscale", "embedding")     # (vocab,) f32
            rows = jnp.take(self.embedding, inputs, axis=0)
            scl = jnp.take(s, inputs, axis=0)
            return rows.astype(jnp.bfloat16) * scl[..., None].astype(
                jnp.bfloat16)
        return super().__call__(inputs)


class PatchifyConv(nn.Module):
    """Stride-p VALID patch-embed conv, computed as im2col + matmul.

    Bit-identical math and an IDENTICAL parameter tree to
    ``nn.Conv(features, (p, p), strides=(p, p), padding="VALID")`` —
    'kernel' (p, p, C, D) and optional 'bias' (D,) — so checkpoints and
    the torch weight porting are unchanged. The lowering differs: XLA's
    convolution with a 3-channel input pads the channel dim onto MXU
    lanes and its filter-gradient pass runs ~1 TF/s, while the same math
    as a (BT·n, p²C) × (p²C, D) matmul runs its fwd+bwd at MXU speed —
    77.4 → 1.16 ms at TimeMamba-B train scale (128×224², bf16;
    benchmarks/r7_patch_embed.py). Reference op:
    avion/models/timemamba.py:203 (PatchEmbed), vimamba.py PatchEmbed.
    """

    features: int
    patch_size: int
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C) → (B, H//p, W//p, D), VALID tail-crop like conv."""
        B, H, W, C = x.shape
        p = self.patch_size
        D = self.features
        kernel = self.param("kernel", self.kernel_init, (p, p, C, D),
                            jnp.float32)
        hh, ww = H // p, W // p
        x = x[:, : hh * p, : ww * p]
        # flax dtype semantics: dtype=None promotes (bf16 x, fp32 kernel)
        # to fp32; an explicit dtype casts both down
        compute = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(compute)
        cols = x.reshape(B, hh, p, ww, p, C).transpose(0, 1, 3, 2, 4, 5)
        cols = cols.reshape(B, hh * ww, p * p * C)
        out = cols @ kernel.astype(compute).reshape(p * p * C, D)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (D,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out.reshape(B, hh, ww, D)


# ---------------------------------------------------------------------------
# regularization


class DropPath(nn.Module):
    """Stochastic depth on the batch dim (blocks.py drop_path)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


class AffineDropPath(nn.Module):
    """DropPath with a learnable per-channel scale, init 1e-4
    (TAL blocks.py AffineDropPath; used by MaskMambaBlock)."""

    dim: int
    rate: float = 0.0
    init_scale: float = 1e-4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        scale = self.param(
            "scale",
            lambda k, s: jnp.full(s, self.init_scale, jnp.float32),
            (1, 1, self.dim),
        )
        return DropPath(rate=self.rate)(x * scale, deterministic=deterministic)


# ---------------------------------------------------------------------------
# masked primitives


class MaskedConv1D(nn.Module):
    """1-D conv over time with output re-masking (TAL blocks.py MaskedConv1D).
    x (B, L, C), mask (B, L) float/bool → (out, out_mask)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask):
        m = mask.astype(x.dtype)[..., None]
        x = x * m
        pad = self.dilation * (self.kernel_size - 1) // 2
        out = nn.Conv(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding=[(pad, self.dilation * (self.kernel_size - 1) - pad)],
            kernel_dilation=(self.dilation,), use_bias=self.use_bias,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        )(x)
        if self.stride > 1:
            out_mask = mask[:, :: self.stride]
        else:
            out_mask = mask
        out = out * out_mask.astype(out.dtype)[..., None]
        return out, out_mask


class LayerNorm1D(nn.Module):
    """LayerNorm over channels with learnable affine (fp32 math)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("norm_w", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("norm_b", nn.initializers.zeros, (self.dim,), jnp.float32)
        return layer_norm(x, w, b, eps=self.eps)


def instance_norm_1d(x: jax.Array, mask: Optional[jax.Array] = None,
                     eps: float = 1e-5) -> jax.Array:
    """InstanceNorm1d(affine=False) on (B, L, C): normalize each channel over
    time per sample (TAS model.py:219). With `mask` (B, L), statistics use
    valid positions only, so padded batches match unpadded ones exactly (the
    reference normalizes over pads — wrong under static-shape bucketing)."""
    xf = x.astype(jnp.float32)
    if mask is None:
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.var(xf, axis=1, keepdims=True)
    else:
        m = mask.astype(jnp.float32)[..., None]
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(xf * m, axis=1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(xf - mean) * m, axis=1, keepdims=True) / cnt
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def max_pool_1d(x: jax.Array, mask: jax.Array, kernel: int = 3, stride: int = 2,
                padding: int = 1) -> Tuple[jax.Array, jax.Array]:
    """MaxPooler (TAS/TAL blocks.py): pool time, nearest-downsample mask."""
    out = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, 1), window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    out_mask = mask[:, ::stride][:, : out.shape[1]]
    out = out * out_mask.astype(out.dtype)[..., None]
    return out, out_mask


# ---------------------------------------------------------------------------
# Mamba blocks with masking


class MaskMambaBlock(nn.Module):
    """norm → Mamba → mask → residual via AffineDropPath (+optional maxpool)
    (TAS/TAL blocks.py:901-976). mixer: 'vim' (MaskMambaBlock) or 'dbm'
    (MaskMambaBlock_DBM, expand=1)."""

    dim: int
    mixer: str = "vim"
    kernel_size: int = 4
    n_ds_stride: int = 1
    drop_path_rate: float = 0.3
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        res = x
        h = LayerNorm1D(self.dim)(x)
        if self.mixer == "vim":
            h = MambaVim(
                d_model=self.dim, d_conv=self.kernel_size, impl=self.impl,
                name="mamba",
            )(h, mask)
        elif self.mixer == "dbm":
            h = MambaDBM(
                d_model=self.dim, d_conv=self.kernel_size, expand=1,
                impl=self.impl, name="mamba",
            )(h, mask)
        else:
            raise ValueError(self.mixer)
        h = h * mask.astype(h.dtype)[..., None]
        if self.drop_path_rate > 0:
            h = AffineDropPath(self.dim, rate=self.drop_path_rate)(
                h, deterministic=deterministic
            )
        x = res + h
        if self.n_ds_stride > 1:
            x, mask = max_pool_1d(x, mask, 3, self.n_ds_stride, 1)
        return x, mask


# ---------------------------------------------------------------------------
# local (sliding-window) attention — the ASFormer decoder primitive


def _flash_mha(q: jax.Array, k: jax.Array, v: jax.Array,
               causal: bool) -> jax.Array:
    """Pallas TPU flash attention on (B, L, H, dh) head tensors → (B, L, D).

    Pads L to a 128 multiple (flash block granularity); padded KEYS are
    masked via segment ids (pad queries attend only pad keys and are sliced
    off). fp32 online softmax inside the kernel — tighter numerics than the
    bf16 scores path it replaces."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, L, H, dh = q.shape
    Lp = -(-L // 128) * 128
    pad = Lp - L

    def to_bhld(t):
        t = jnp.swapaxes(t, 1, 2)  # (B, H, L, dh)
        if pad:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return t

    qf, kf, vf = to_bhld(q), to_bhld(k), to_bhld(v)
    seg = None
    if pad:
        ids = (jnp.arange(Lp) >= L).astype(jnp.int32)[None]
        ids = jnp.broadcast_to(ids, (B, Lp))
        seg = SegmentIds(q=ids, kv=ids)
    blk = min(512, Lp)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(qf, kf, vf, segment_ids=seg, causal=causal,
                          sm_scale=1.0 / math.sqrt(dh), block_sizes=sizes)
    out = jnp.swapaxes(out[:, :, :L], 1, 2)  # (B, L, H, dh)
    return out.reshape(B, L, H * dh)


class _HeadMajorQKV(nn.Module):
    """Fused qkv projection emitting the HEAD-MAJOR (B, T, 3H, S, dh) layout
    the row_mha_qkv kernel consumes. Declares the SAME ('kernel' (D, 3D),
    'bias' (3D,)) params as the nn.Dense it substitutes — checkpoints and
    weight porting unchanged; only the contraction layout differs (the
    transpose rides XLA's dot layout assignment instead of a copy)."""

    dim: int
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        D, H = self.dim, self.heads
        dh = D // H
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (D, 3 * D), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (3 * D,),
                          jnp.float32)
        compute = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        w3 = kernel.reshape(D, 3 * H, dh).astype(compute)
        b3 = bias.reshape(3 * H, dh).astype(compute)
        return (jnp.einsum("bntd,dhe->bthne", x.astype(compute), w3)
                + b3[None, None, :, None])


class _HeadMajorOut(nn.Module):
    """Output projection consuming the row kernel's (B, T, H, S, dh) and
    producing patch-major (B, S, T, D). Same ('kernel' (D, D), 'bias')
    params as the nn.Dense it substitutes."""

    dim: int
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, out5):
        D, H = self.dim, self.heads
        dh = D // H
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (D, D), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        compute = self.dtype or jnp.promote_types(out5.dtype, kernel.dtype)
        wo = kernel.reshape(H, dh, D).astype(compute)
        return (jnp.einsum("bthne,hef->bntf", out5.astype(compute), wo)
                + bias.astype(compute))


class FusedMHA(nn.Module):
    """Multi-head self-attention with a FUSED qkv projection.

    Replaces flax's MultiHeadDotProductAttention on the hot vision paths:
    one (D, 3D) MXU matmul + one HBM read of x instead of three separate
    DenseGenerals; scores/softmax run in the compute dtype (bf16 under the
    bf16 policy), with fp32 accumulation only inside the MXU matmuls —
    matching the flax module it replaced. The packed qkv kernel is
    also the reference checkpoints' native layout (torch in_proj_weight,
    models/convert.py:convert_attention).
    """

    num_heads: int
    dtype: Any = None
    causal: bool = False
    flash: Optional[Any] = None   # True: Pallas flash kernel (fp32 online
                                  # softmax). MEASURED SLOWER at the vision
                                  # shapes (197 tokens pad to 256; B·t=128
                                  # grid): 79 vs 46 ms for the 12-layer
                                  # spatial stack — default stays the XLA
                                  # einsum path; opt in for long sequences.
                                  # "vmem": whole-row VMEM kernel
                                  # (ops/vision_attention.py) — also measured
                                  # slower at the vision shape (1.37 vs
                                  # 1.23 ms at I128/h12/N197/dh64; XLA's
                                  # pipelined fusion wins), kept as an option
                                  # for its fp32-softmax numerics.
                                  # "row": head-major packed-qkv whole-row
                                  # kernel on the seq_axis=1 4-D path
                                  # (row_mha_qkv). Wins 1.13x on the ISOLATED
                                  # 12-layer sandwich (benchmarks/r8_attn.py)
                                  # but is NEUTRAL inside the full TimeMamba-B
                                  # forward and SLOWER in training (346→394 ms
                                  # — the custom_vjp blocks remat fusion;
                                  # benchmarks/r9_integration.py), so the
                                  # default stays the einsum path; kept for
                                  # its fp32-softmax numerics and as the
                                  # standalone-attention fast path.
    quant: bool = False           # w8a8 serving mode for qkv/out projections
    seq_axis: int = -2            # 1 on a 4-D (B, S, T, D) input: attention
                                  # over S batched over (B, T) WITHOUT
                                  # flattening — keeps the producer's
                                  # patch-major layout so XLA's dot layout
                                  # assignment absorbs the transposes
                                  # (measured -6% on the TimeMamba spatial
                                  # sandwich, benchmarks/r5_attn_layout.py)

    @nn.compact
    def __call__(self, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        D = x.shape[-1]
        H = self.num_heads
        dh = D // H
        if (self.flash == "row" and self.seq_axis == 1 and x.ndim == 4
                and not (self.causal or self.quant)
                and x.shape[1] <= 512):
            # head-major packed-qkv whole-row kernel (r8 winner, 1.13x over
            # the einsum path at the TimeMamba shape): the projection emits
            # (B, T, 3H, N, dh) directly — the layout change rides the dot —
            # and the kernel keeps every (N, N) fp32 score row in VMEM.
            # Param tree is IDENTICAL to the einsum path (same 'qkv'/'out'
            # Dense kernels, reshaped at apply time).
            from ..ops.vision_attention import row_mha_qkv

            B_, S, T_ = x.shape[:3]
            hm = _HeadMajorQKV(dim=D, heads=H, dtype=self.dtype, name="qkv")
            qkv5 = hm(x)                           # (B, T, 3H, S, dh)
            out5 = row_mha_qkv(
                qkv5, interpret=jax.default_backend() != "tpu")
            return _HeadMajorOut(dim=D, heads=H, dtype=self.dtype,
                                 name="out")(out5)
        qkv = make_dense(3 * D, quant=self.quant, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.seq_axis == 1 and x.ndim == 4:
            if self.causal or (self.flash and self.flash != "row"):
                raise ValueError("seq_axis=1 supports plain bidirectional "
                                 "attention only")
            B_, S, T_ = x.shape[:3]
            q, k, v = (t.reshape(B_, S, T_, H, dh) for t in (q, k, v))
            scores = jnp.einsum("bqthd,bkthd->bthqk", q, k)
            scores = scores * (1.0 / math.sqrt(dh))
            w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            from jax.ad_checkpoint import checkpoint_name

            w = checkpoint_name(w, "attn_weights")
            out = jnp.einsum("bthqk,bkthd->bqthd", w, v)
            out = out.reshape(B_, S, T_, D)
            return make_dense(D, quant=self.quant, dtype=self.dtype,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="out")(out)

        def heads(t):
            return t.reshape(t.shape[:-1] + (H, dh))

        q, k, v = heads(q), heads(k), heads(v)
        if (self.flash == "vmem" and x.ndim == 3 and not self.causal
                and x.shape[-2] <= 512):
            from ..ops.vision_attention import vision_mha

            interp = jax.default_backend() != "tpu"
            out = vision_mha(*(jnp.swapaxes(t, 1, 2) for t in (q, k, v)),
                             interpret=interp)
            out = jnp.swapaxes(out, 1, 2).reshape(x.shape[:-1] + (D,))
            return make_dense(D, quant=self.quant, dtype=self.dtype,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="out")(out)
        use_flash = self.flash is True and jax.default_backend() == "tpu"
        if use_flash and x.ndim == 3 and dh % 64 == 0:
            return make_dense(D, quant=self.quant, dtype=self.dtype,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="out")(_flash_mha(q, k, v, self.causal))
        # scores stay in the compute dtype (bf16 under the bf16 policy) so
        # the (…, h, q, k) tensor is half the bytes; the MXU accumulates in
        # fp32 internally either way
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k)
        scores = scores * (1.0 / math.sqrt(dh))
        if self.causal:
            L = x.shape[-2]
            idx = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
            jdx = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
            scores = jnp.where(jdx <= idx, scores, jnp.asarray(
                -1e30, scores.dtype))
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        # named for targeted remat (save_only_these_names): keeping the
        # softmax weights across the remat boundary skips the qk-scores +
        # softmax recompute in the bwd at ~119 MB/layer of HBM
        from jax.ad_checkpoint import checkpoint_name

        w = checkpoint_name(w, "attn_weights")
        out = jnp.einsum("...hqk,...khd->...qhd", w, v)
        out = out.reshape(out.shape[:-2] + (D,))
        return make_dense(D, quant=self.quant, dtype=self.dtype,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="out")(out)


def _log_mask(mask: jax.Array) -> jax.Array:
    return jnp.log(mask.astype(jnp.float32) + 1e-6)


def sliding_window_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array, bl: int
) -> jax.Array:
    """ASFormer 'sliding_att' (TAS model.py:133-171), vectorized over blocks.

    q (B, L, dq), k (B, L, dq), v (B, L, dv), mask (B, L) → (B, L, dv).
    Each query block of size bl attends to a window [i·bl − bl//2,
    (i+1)·bl + bl//2), with per-row window masking exactly as the reference's
    `construct_window_mask` (model.py:67-74).
    """
    B, L, dq = q.shape
    dv = v.shape[-1]
    nb = -(-L // bl)
    pad_l = nb * bl - L
    half = bl // 2
    win = bl + 2 * half  # reference window width

    qp = jnp.pad(q, ((0, 0), (0, pad_l), (0, 0)))
    # pad so total length is (nb+1)*bl: 'half' on the left, the rest right —
    # every window [i·bl, i·bl + win) then lies inside blocks i and i+1
    right = (nb + 1) * bl - L - half
    kp = jnp.pad(k, ((0, 0), (half, right), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (half, right), (0, 0)))
    mp = jnp.pad(mask.astype(jnp.float32), ((0, 0), (half, right)))

    qb = qp.reshape(B, nb, bl, dq)

    def windows(x):
        # (B, (nb+1)·bl, c) → (B, nb, 2·bl, c) → slice to win
        c = x.shape[-1]
        blocks = x.reshape(B, nb + 1, bl, c)
        two = jnp.concatenate([blocks[:, :nb], blocks[:, 1:]], axis=2)
        return two[:, :, :win]

    kb = windows(kp)                       # (B, nb, win, dq)
    vb = windows(vp)                       # (B, nb, win, dv)
    mb = windows(mp[..., None])[..., 0]    # (B, nb, win)

    # per-row window mask: query row r sees window cols [r, r + bl)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bl, win), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bl, win), 1)
    wmask = ((cols >= rows) & (cols < rows + bl)).astype(jnp.float32)

    scores = jnp.einsum("bnqc,bnwc->bnqw", qb, kb) / math.sqrt(dq)
    full_mask = wmask[None, None] * mb[:, :, None, :]
    scores = scores + _log_mask(full_mask)
    attn = jax.nn.softmax(scores, axis=-1) * full_mask
    out = jnp.einsum("bnqw,bnwc->bnqc", attn, vb)
    out = out.reshape(B, nb * bl, dv)[:, :L]
    return out * mask.astype(out.dtype)[..., None]


def sinusoid_positions(length: int, dim: int) -> jax.Array:
    """Standard sin/cos table (TAS PositionalEncoding, model.py:252-269).
    dim must be even."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe
