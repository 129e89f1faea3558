"""Mamba mixer modules (flax.linen), TPU-native.

Re-implements the four mixer roles of the reference module library:

  * ``MambaVim``      — bidirectional "bimamba v2" with mirrored parameters
                        (/root/reference/mamba/mamba_ssm/modules/mamba_simple.py:34-378)
  * ``MambaDBM``      — "decomposed bi-Mamba": one in_proj emitting two (x,z)
                        pairs, shared scan parameters for both directions,
                        channel-concat output (mamba_new.py:34-317). Instead of
                        the reference's batch-concat trick (mamba_new.py:192-214),
                        which fights sharded batch axes, the two directions run
                        as two calls of the shared-weight inner fn — identical
                        math, sharding-safe (SURVEY.md §7 hard part g).
  * ``MambaScanNorm`` — ViM variant with RMSNorm(d_inner) on the summed
                        directions before out_proj (mamba_simple_scan_norm.py).
  * ``MambaCausal``   — unidirectional Mamba (upstream mamba_ssm semantics,
                        needed by action-anticipation's LSTR decoder) with a
                        functional single-token `step` for streaming decode.

All modules take/return (batch, seqlen, d_model) and share the init scheme of
the reference: dt_proj weight ~ U(±dt_rank^-1/2·dt_scale), dt bias =
softplus^-1(LogUniform[dt_min, dt_max]) (mamba_simple.py:99-109), S4D-real
A_log = log(1..d_state) (:111-119), D = 1.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    causal_conv1d_update,
    fused_add_norm,
    mamba_inner,
    rms_norm,
    selective_state_update,
)
from ..ops.mamba_inner import mamba_inner_bidir

Dtype = Any


def dt_proj_kernel_init(dt_rank: int, dt_scale: float = 1.0,
                        dt_init: str = "random") -> Callable:
    """dt projection weight init (mamba_simple.py:90-97)."""
    std = dt_rank ** -0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        if dt_init == "constant":
            return jnp.full(shape, std, dtype)
        if dt_init == "random":
            return jax.random.uniform(key, shape, dtype, -std, std)
        raise NotImplementedError(dt_init)

    return init


def dt_bias_init(dt_min: float = 0.001, dt_max: float = 0.1,
                 dt_init_floor: float = 1e-4) -> Callable:
    """Inverse-softplus init so softplus(bias) ~ LogUniform[dt_min, dt_max]
    (mamba_simple.py:99-107)."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.maximum(dt, dt_init_floor)
        # softplus^-1(x) = x + log(1 - exp(-x))
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def a_log_init(d_state: int) -> Callable:
    """S4D-real: A = (1..d_state) per channel, stored as log (fp32)."""

    def init(key, shape, dtype=jnp.float32):
        d_inner = shape[0]
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32), (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default (kaiming_uniform a=√5 ⇒ U(±1/√fan_in)) for
    training-dynamics parity with the reference task suites."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _conv_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv1d default for a depthwise kernel: U(±1/√width)."""
    width = shape[0]
    bound = 1.0 / math.sqrt(width)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _ScanParams(nn.Module):
    """One direction's scan parameter bundle (conv + projections + A, D)."""

    d_inner: int
    d_state: int
    d_conv: int
    dt_rank: int
    dt_min: float
    dt_max: float
    dt_init: str
    dt_scale: float
    dt_init_floor: float
    conv_bias: bool
    param_dtype: Dtype = jnp.float32

    def setup(self):
        pd = self.param_dtype
        self.conv_w = self.param("conv_w", _conv_init, (self.d_conv, self.d_inner), pd)
        self.conv_b = (
            self.param("conv_bias", nn.initializers.zeros, (self.d_inner,), pd)
            if self.conv_bias else None
        )
        self.x_proj = self.param(
            "x_proj", torch_linear_init,
            (self.d_inner, self.dt_rank + 2 * self.d_state), pd,
        )
        self.dt_proj = self.param(
            "dt_proj", dt_proj_kernel_init(self.dt_rank, self.dt_scale, self.dt_init),
            (self.dt_rank, self.d_inner), pd,
        )
        # fp32 always (reference keeps these fp32: mamba_simple.py:117-123)
        self.dt_bias = self.param(
            "dt_bias", dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (self.d_inner,), jnp.float32,
        )
        self.A_log = self.param(
            "A_log", a_log_init(self.d_state), (self.d_inner, self.d_state),
            jnp.float32,
        )
        self.D = self.param("D", nn.initializers.ones, (self.d_inner,), jnp.float32)

    def param_dict(self) -> dict:
        return dict(conv_w=self.conv_w, conv_b=self.conv_b,
                    x_proj=self.x_proj, dt_proj=self.dt_proj,
                    dt_bias=self.dt_bias, D=self.D)

    def __call__(self, xz: jax.Array, impl: str = "auto",
                 mask: Optional[jax.Array] = None,
                 return_last_state: bool = False,
                 reverse: bool = False) -> jax.Array:
        A = -jnp.exp(self.A_log)
        return mamba_inner(
            xz, self.conv_w, self.conv_b, self.x_proj, self.dt_proj,
            A, D=self.D, delta_bias=self.dt_bias, delta_softplus=True,
            impl=impl, mask=mask, return_last_state=return_last_state,
            reverse=reverse,
        )


def _resolve_dt_rank(d_model: int, dt_rank) -> int:
    return math.ceil(d_model / 16) if dt_rank == "auto" else int(dt_rank)


class _MambaBase(nn.Module):
    """Shared constructor surface (mirrors mamba_simple.py:35-56)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Any = "auto"
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    if_devide_out: bool = False  # (sic) reference spelling
    layer_idx: Optional[int] = None
    impl: str = "auto"
    fuse_scan: Optional[bool] = None  # both directions in one scan call.
                                   # None = auto: ON for short sequences on
                                   # TPU (the interleaved bidirectional
                                   # kernel, ~1.2x one direction instead of
                                   # 2x and flip-free), OFF otherwise (the
                                   # long-seq grouped-channel form measured
                                   # slower than two calls on v5e).
    dtype: Dtype = None            # compute dtype (bf16 policy)
    param_dtype: Dtype = jnp.float32
    quant: bool = False            # w8a8 serving mode for in/out_proj
                                   # (common.QuantDense; inference-only)

    def _dense(self):
        if self.quant:
            from .common import QuantDense

            return QuantDense
        # identical to nn.Dense unless apply() receives offline-quantized
        # int8 kernels (a 'qscale' collection — models/quant_decode.py)
        from .common import W8Dense

        return W8Dense

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def _dt_rank(self) -> int:
        return _resolve_dt_rank(self.d_model, self.dt_rank)

    def _scan_params(self, name: str) -> _ScanParams:
        return _ScanParams(
            d_inner=self.d_inner, d_state=self.d_state, d_conv=self.d_conv,
            dt_rank=self._dt_rank, dt_min=self.dt_min, dt_max=self.dt_max,
            dt_init=self.dt_init, dt_scale=self.dt_scale,
            dt_init_floor=self.dt_init_floor, conv_bias=self.conv_bias,
            param_dtype=self.param_dtype, name=name,
        )

    def _use_fuse_scan(self, seqlen: int) -> bool:
        if self.fuse_scan is not None:
            return self.fuse_scan
        from ..ops.selective_scan_pallas import SHORT_SEQ_MAX

        return (
            jax.default_backend() == "tpu"
            and self.impl in ("auto", "pallas")
            and -(-seqlen // 8) * 8 <= SHORT_SEQ_MAX
        )


class MambaVim(_MambaBase):
    """Bidirectional Mamba, "bimamba v2" (mamba_simple.py, the ViM mixer).

    out = out_proj( scan_f(xz) + flip(scan_b(flip(xz))) [/2 if if_devide_out] )
    with fully mirrored backward-direction parameters (:126-153).

    `ring_mesh` + `ring_axes=(batch_axis, seq_axis)`: sequence-parallel
    mode — the forward routes through parallel.ring_mamba_vim (ppermute
    prefix rings, conv halo exchange) with the time axis sharded over
    `seq_axis` and the batch over `batch_axis` of the given mesh. Same
    math, same parameters; composes data × sequence parallelism inside a
    jitted GSPMD program (SURVEY §2.4). Masks are not supported in ring
    mode (the suite's video towers feed unmasked fixed-length clips).
    """

    ring_mesh: Any = None            # jax.sharding.Mesh | None
    ring_axes: Tuple[str, str] = ("data", "seq")

    def setup(self):
        d_in = self.d_inner
        dense = self._dense()
        self.in_proj = dense(
            2 * d_in, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in_proj",
        )
        self.fwd = self._scan_params("fwd")
        self.bwd = self._scan_params("bwd")
        self.out_proj = dense(
            self.d_model, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj",
        )

    def _ring_forward(self, x: jax.Array) -> jax.Array:
        """Sequence-parallel forward via parallel.ring_mamba_vim, reusing
        this module's own parameters (post-init only: the ring consumes the
        param values directly, so init must run the local path once)."""
        from ..parallel.ring_scan import ring_mamba_vim

        if self.bias or self.quant:
            raise NotImplementedError(
                "ring mode supports bias=False, quant=False MambaVim")

        def side(sp: _ScanParams) -> dict:
            d = sp.param_dict()
            p = dict(conv_w=d["conv_w"], x_proj=d["x_proj"],
                     dt_proj=d["dt_proj"], dt_bias=d["dt_bias"], D=d["D"],
                     A_log=sp.A_log)
            if d["conv_b"] is not None:
                p["conv_bias"] = d["conv_b"]
            return p

        params = {
            "in_proj": {"kernel": self.in_proj.variables["params"]["kernel"]},
            "out_proj": {"kernel": self.out_proj.variables["params"]["kernel"]},
            "fwd": side(self.fwd),
            "bwd": side(self.bwd),
        }
        batch_axis, seq_axis = self.ring_axes
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return ring_mamba_vim(
            self.ring_mesh, params, x, axis_name=seq_axis, impl=self.impl,
            if_devide_out=self.if_devide_out, batch_axis=batch_axis,
        )

    def __call__(self, hidden_states: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        if self.ring_mesh is not None and not self.is_initializing():
            assert mask is None, "ring mode does not support masks"
            return self._ring_forward(hidden_states)
        xz = self.in_proj(hidden_states)                      # (b, l, 2*d_in)
        if self._use_fuse_scan(xz.shape[1]):
            out_f, out_b = mamba_inner_bidir(
                xz, xz, self.fwd.param_dict(), self.bwd.param_dict(),
                -jnp.exp(self.fwd.A_log), -jnp.exp(self.bwd.A_log),
                mask=mask, impl=self.impl,
            )
            out = out_f + out_b
        else:
            # flip-free: the bwd direction runs the reverse kernels
            # (mamba_inner reverse=True) instead of the reference's
            # flip(scan(flip)) pattern (mamba_simple.py bimamba v2)
            out_f = self.fwd(xz, impl=self.impl, mask=mask)
            out_b = self.bwd(xz, impl=self.impl, mask=mask, reverse=True)
            out = out_f + out_b
        if self.if_devide_out:
            out = out / 2
        return self.out_proj(out)


class MambaDBM(_MambaBase):
    """Decomposed bi-Mamba (mamba_new.py): two (x,z) streams from one
    in_proj, *shared* scan parameters for both directions, outputs
    channel-concatenated into out_proj(2·d_inner → d_model).

    Task suites instantiate it with expand=1 to keep parameter count
    comparable to attention (SURVEY.md §2.2).
    """

    def setup(self):
        dense = self._dense()
        d_in = self.d_inner
        self.in_proj = dense(
            4 * d_in, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in_proj",
        )
        self.shared = self._scan_params("shared")
        self.out_proj = dense(
            self.d_model, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj",
        )

    def __call__(self, hidden_states: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        d_in = self.d_inner
        xz = self.in_proj(hidden_states)                      # (b, l, 4*d_in)
        xz_f, xz_b = xz[..., : 2 * d_in], xz[..., 2 * d_in :]
        if self._use_fuse_scan(xz.shape[1]):
            pd = self.shared.param_dict()
            A = -jnp.exp(self.shared.A_log)
            out_f, out_b = mamba_inner_bidir(
                xz_f, xz_b, pd, pd, A, A, mask=mask, impl=self.impl,
            )
            out = jnp.concatenate([out_f, out_b], axis=-1)
        else:
            out_f = self.shared(xz_f, impl=self.impl, mask=mask)
            out_b = self.shared(xz_b, impl=self.impl, mask=mask,
                                reverse=True)
            out = jnp.concatenate([out_f, out_b], axis=-1)
        return self.out_proj(out)


class MambaScanNorm(_MambaBase):
    """ViM with RMSNorm(d_inner) on the direction sum before out_proj
    (mamba_simple_scan_norm.py:263-292) instead of the /2."""

    def setup(self):
        dense = self._dense()
        d_in = self.d_inner
        self.in_proj = dense(
            2 * d_in, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in_proj",
        )
        self.fwd = self._scan_params("fwd")
        self.bwd = self._scan_params("bwd")
        self.scan_norm_w = self.param(
            "scan_norm_w", nn.initializers.ones, (d_in,), jnp.float32
        )
        self.out_proj = dense(
            self.d_model, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj",
        )

    def __call__(self, hidden_states: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        xz = self.in_proj(hidden_states)
        if self._use_fuse_scan(xz.shape[1]):
            out_f, out_b = mamba_inner_bidir(
                xz, xz, self.fwd.param_dict(), self.bwd.param_dict(),
                -jnp.exp(self.fwd.A_log), -jnp.exp(self.bwd.A_log),
                mask=mask, impl=self.impl,
            )
            out = out_f + out_b
        else:
            out_f = self.fwd(xz, impl=self.impl, mask=mask)
            out_b = self.bwd(xz, impl=self.impl, mask=mask, reverse=True)
            out = out_f + out_b
        out = rms_norm(out, self.scan_norm_w)
        return self.out_proj(out)


class MambaCausal(_MambaBase):
    """Unidirectional Mamba (upstream mamba_ssm semantics; used by the
    action-anticipation LSTR decoder, SURVEY.md §2.3) with streaming decode.

    `__call__` runs the full-sequence fused path; `step` advances one token
    given (conv_state, ssm_state), the functional analogue of
    mamba_simple.py:292-337.
    """

    def setup(self):
        dense = self._dense()
        d_in = self.d_inner
        self.in_proj = dense(
            2 * d_in, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in_proj",
        )
        self.fwd = self._scan_params("fwd")
        self.out_proj = dense(
            self.d_model, use_bias=self.bias, kernel_init=torch_linear_init,
            dtype=self.dtype, param_dtype=self.param_dtype, name="out_proj",
        )

    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        xz = self.in_proj(hidden_states)
        return self.out_proj(self.fwd(xz, impl=self.impl))

    def init_state(self, batch: int, dtype=jnp.float32):
        """(conv_state, ssm_state) zeros — mamba_simple.py:339-350."""
        return (
            jnp.zeros((batch, self.d_conv, self.d_inner), dtype),
            jnp.zeros((batch, self.d_inner, self.d_state), jnp.float32),
        )

    def prefill(
        self, hidden_states: jax.Array
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Full-sequence forward that ALSO returns the decode state.

        One fused-scan pass over the prompt replaces prompt_len `step`
        calls — the TPU analogue of the reference's seqlen_offset=0
        prefill forward (utils/generation.py:93-150, mamba_simple.py
        inference-params path :157-199).

        hidden_states: (batch, L, d_model) →
          (out (batch, L, d_model), (conv_state, ssm_state)) where the
          state continues the sequence exactly as if `step` had been
          called L times (parity-tested in tests/test_mamba_modules.py).
        """
        xz = self.in_proj(hidden_states)
        x = xz[..., : self.d_inner]
        y, ssm_state = self.fwd(xz, impl=self.impl, return_last_state=True)
        # conv_state holds the last d_conv RAW (pre-conv) x rows, oldest
        # first — the window causal_conv1d_update rolls (ops/causal_conv1d
        # .py:93). Left-pad with zeros when the prompt is shorter.
        L = x.shape[1]
        if L >= self.d_conv:
            conv_state = x[:, L - self.d_conv:, :]
        else:
            conv_state = jnp.pad(x, ((0, 0), (self.d_conv - L, 0), (0, 0)))
        conv_state = conv_state.astype(jnp.float32)
        return self.out_proj(y), (conv_state, ssm_state)

    def step(
        self, x_t: jax.Array, state: Tuple[jax.Array, jax.Array]
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """One decode step. x_t: (batch, d_model) → (out, new_state)."""
        conv_state, ssm_state = state
        p = self.fwd
        xz = self.in_proj(x_t)                       # (b, 2*d_in)
        x, z = xz[..., : self.d_inner], xz[..., self.d_inner :]
        x, conv_state = causal_conv1d_update(
            x, conv_state, p.conv_w, p.conv_b, activation="silu"
        )
        x_db = jnp.dot(x, p.x_proj.astype(x.dtype))
        dt = x_db[..., : self._dt_rank]
        B = x_db[..., self._dt_rank : self._dt_rank + self.d_state]
        C = x_db[..., self._dt_rank + self.d_state :]
        dt = jnp.dot(dt, p.dt_proj.astype(dt.dtype))
        A = -jnp.exp(p.A_log)
        y, ssm_state = selective_state_update(
            ssm_state, x, dt, A, B, C, D=p.D, z=z,
            dt_bias=p.dt_bias, dt_softplus=True,
        )
        return self.out_proj(y), (conv_state, ssm_state)


class Block(nn.Module):
    """Pre-norm residual block: Add → Norm → Mixer, returning
    (hidden_states, residual) so the add+norm stays fused
    (mamba_simple.py:381-437). `step` advances one token for decoding when
    the mixer supports it (MambaCausal)."""

    dim: int
    mixer_cls: Callable[..., nn.Module]
    norm_eps: float = 1e-5
    rms: bool = False
    residual_in_fp32: bool = True

    def setup(self):
        self.norm_w = self.param(
            "norm_w", nn.initializers.ones, (self.dim,), jnp.float32
        )
        self.norm_b = (
            None if self.rms
            else self.param("norm_b", nn.initializers.zeros, (self.dim,), jnp.float32)
        )
        self.mixer = self.mixer_cls(name="mixer")

    def _add_norm(self, hidden_states, residual):
        return fused_add_norm(
            hidden_states, self.norm_w, self.norm_b, residual=residual,
            prenorm=True, residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_eps, is_rms_norm=self.rms,
        )

    def __call__(
        self,
        hidden_states: jax.Array,
        residual: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        hidden_states, residual = self._add_norm(hidden_states, residual)
        hidden_states = self.mixer(hidden_states)
        return hidden_states, residual

    def step(self, hidden_states, residual, state):
        """Single-token variant: hidden_states (batch, dim)."""
        hidden_states, residual = self._add_norm(hidden_states, residual)
        hidden_states, state = self.mixer.step(hidden_states, state)
        return hidden_states, residual, state

    def prefill(self, hidden_states, residual=None):
        """Full-sequence forward returning the mixer's decode state
        (MambaCausal.prefill). hidden_states (batch, L, dim)."""
        hidden_states, residual = self._add_norm(hidden_states, residual)
        hidden_states, state = self.mixer.prefill(hidden_states)
        return hidden_states, residual, state


_MIXERS = {
    "vim": MambaVim,
    "dbm": MambaDBM,
    "scan_norm": MambaScanNorm,
    "causal": MambaCausal,
}


def make_block(
    d_model: int,
    mixer: str = "vim",
    layer_idx: Optional[int] = None,
    rms_norm_block: bool = False,
    residual_in_fp32: bool = True,
    norm_eps: float = 1e-5,
    **mixer_kwargs,
) -> Block:
    """Factory equivalent of the reference `create_block`
    (models/mixer_seq_simple.py:21-48; univtg_mamba.py:37-72)."""
    cls = _MIXERS[mixer]
    mixer_cls = lambda name: cls(  # noqa: E731
        d_model=d_model, layer_idx=layer_idx, name=name, **mixer_kwargs
    )
    return Block(
        dim=d_model, mixer_cls=mixer_cls, rms=rms_norm_block,
        residual_in_fp32=residual_in_fp32, norm_eps=norm_eps,
    )
