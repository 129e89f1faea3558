"""Sequence-parallel selective scan + Mamba mixer over a mesh axis.

The reference handles long sequences only *inside* one GPU kernel (chunked
cub::BlockScan with carried prefix, selective_scan_fwd_kernel.cuh:131-254);
no cross-device sequence parallelism exists anywhere in the suite
(SURVEY.md §2.4/§5). This module adds it, TPU-native: shard the time axis L
over a mesh axis, run the local chunked scan on each shard, and chain shards
by exchanging (∏a, last_state) prefixes — the associative-scan analogue of
ring attention.

Design (two-pass, kernel-friendly):
  1. local scan with zero initial state → per-shard last_state;
  2. exclusive prefix over the device axis via log₂(ndev) `lax.ppermute`
     hops combining (a_prod, state) pairs — a_prod = exp((Σ_t dt)·A) is
     analytic (one reduction, no second scan);
  3. re-run the local scan seeded with the incoming prefix
     (`initial_state=`, which the Pallas chunked kernel consumes natively
     and differentiates exactly — dh0 / last-state cotangents flow).
This avoids materializing any (b, l, d, n) correction tensor, so memory
stays O(b·l·d) — the point of sequence parallelism.

`reverse=True` runs the anti-causal direction (suffix chaining) for the
bidirectional ViM/DBM mixers; `ring_mamba_vim` is a full sequence-parallel
ViM mixer forward (causal-conv halo exchange + one ring per direction)
operating on MambaVim's parameter tree.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.causal_conv1d import causal_conv1d
from ..ops.selective_scan import selective_scan_assoc, selective_scan_ref


def _local_scan(u, delta, A, B, C, D, z, delta_bias, delta_softplus, impl,
                h0=None, reverse=False):
    """One shard's scan; optionally time-reversed; returns (out, last)."""
    flip = (lambda x: jnp.flip(x, axis=1)) if reverse else (lambda x: x)
    args = (flip(u), flip(delta), A, flip(B), flip(C))
    kw = dict(D=D, z=flip(z) if z is not None else None,
              delta_bias=delta_bias, delta_softplus=delta_softplus,
              return_last_state=True)
    if impl == "pallas":
        from ..ops.selective_scan_pallas import selective_scan_pallas

        out, last = selective_scan_pallas(*args, initial_state=h0, **kw)
    else:
        # assoc/ref path: fold h0 analytically — h_t += (∏_{s≤t} a_s)·h0,
        # y_t += C_t·that. Exact and differentiable, but materializes
        # (b, l, d, n); fine for tests/small models.
        fn = selective_scan_ref if impl == "ref" else selective_scan_assoc
        out, last = fn(*args, **kw)
        if h0 is not None:
            dtf = flip(delta).astype(jnp.float32)
            if delta_bias is not None:
                dtf = dtf + delta_bias.astype(jnp.float32)
            if delta_softplus:
                dtf = jax.nn.softplus(dtf)
            decay = jnp.exp(jnp.cumsum(dtf, axis=1)[..., None] * A[None, None])
            carried = decay * h0[:, None].astype(jnp.float32)  # (b, l, d, n)
            Cf = args[4].astype(jnp.float32)
            corr = jnp.einsum("bldn,bln->bld", carried, Cf)
            if z is not None:
                corr = corr * jax.nn.silu(flip(z).astype(jnp.float32))
            out = out + corr.astype(out.dtype)
            last = last + carried[:, -1]
    return flip(out), last


def _device_prefix(a_prod, last, axis_name: str, reverse: bool):
    """EXCLUSIVE prefix of (a, s) pairs over the device axis via log-step
    ppermute doubling (ICI-friendly; replaces the all_gather + O(ndev) fold).

    Combine (earlier)∘(later): (a1,s1)∘(a2,s2) = (a1·a2, a2·s1 + s2).
    With reverse=True the 'earlier' side is the HIGHER device index (the
    anti-causal suffix chaining of the backward direction).
    """
    ndev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    a, s = a_prod, last
    dist = 1
    while dist < ndev:
        if reverse:
            perm = [(i, i - dist) for i in range(dist, ndev)]
            has_src = idx < ndev - dist
        else:
            perm = [(i, i + dist) for i in range(ndev - dist)]
            has_src = idx >= dist
        a_in = lax.ppermute(a, axis_name, perm)
        s_in = lax.ppermute(s, axis_name, perm)
        a_in = jnp.where(has_src, a_in, jnp.ones_like(a_in))
        s_in = jnp.where(has_src, s_in, jnp.zeros_like(s_in))
        s = a * s_in + s
        a = a * a_in
        dist *= 2
    # shift by one device to make the inclusive prefix exclusive
    if reverse:
        perm = [(i, i - 1) for i in range(1, ndev)]
        has_src = idx < ndev - 1
    else:
        perm = [(i, i + 1) for i in range(ndev - 1)]
        has_src = idx >= 1
    h0 = lax.ppermute(s, axis_name, perm)
    return jnp.where(has_src, h0, jnp.zeros_like(h0))


def _shard_body(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                axis_name, impl, reverse):
    dtf = delta.astype(jnp.float32)
    if delta_bias is not None:
        dtf = dtf + delta_bias.astype(jnp.float32)
    if delta_softplus:
        dtf = jax.nn.softplus(dtf)

    # pass 1: zero-state local scan → shard last state
    _, last = _local_scan(u, delta, A, B, C, None, None, delta_bias,
                          delta_softplus, impl, reverse=reverse)
    # shard-total decay ∏_t a_t = exp((Σ_t dt)·A) — analytic
    a_prod = jnp.exp(jnp.sum(dtf, axis=1)[..., None] * A[None])
    h0 = _device_prefix(a_prod, last.astype(jnp.float32), axis_name, reverse)
    # pass 2: seeded local scan with gating/skip fused
    out, _ = _local_scan(u, delta, A, B, C, D, z, delta_bias,
                         delta_softplus, impl, h0=h0, reverse=reverse)
    return out


def ring_selective_scan(
    mesh: Mesh,
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    z: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    axis_name: str = "seq",
    impl: str = "auto",
    reverse: bool = False,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Selective scan with the time axis sharded over `axis_name`.

    Shapes as selective_scan (time-major, B/C rank 3); the local shard
    length must be a multiple of 8 for the Pallas path. Differentiable
    end-to-end (the Pallas kernel's initial_state/last_state VJP carries
    the cross-shard cotangents through the ppermute chain).
    reverse=True chains shards anti-causally (the mixers' flip direction).

    `batch_axis`: mesh axis the BATCH dim is sharded over (composed
    data × sequence parallelism). Without it, running on a 2-D mesh makes
    GSPMD all-gather the batch at the shard_map boundary (observed:
    f32[B_full, l_shard, d] all-gathers in the compiled HLO).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "assoc"
    seq_spec = P(batch_axis, axis_name, None)
    in_specs = [seq_spec, seq_spec, P(), seq_spec, seq_spec,
                P(), seq_spec if z is not None else P(), P()]
    args = [u, delta, A, B, C,
            D if D is not None else jnp.zeros((1,), jnp.float32),
            z if z is not None else jnp.zeros((1, 1, 1), u.dtype),
            delta_bias if delta_bias is not None else jnp.zeros((1,), jnp.float32)]
    has_d, has_z, has_bias = D is not None, z is not None, delta_bias is not None

    def body(u, delta, A, B, C, D_, z_, bias_):
        return _shard_body(
            u, delta, A, B, C,
            D_ if has_d else None,
            z_ if has_z else None,
            bias_ if has_bias else None,
            delta_softplus, axis_name, impl, reverse,
        )

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which strict shard_map rejects
    f = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                      out_specs=seq_spec, check_vma=False)
    return f(*args)


# ---------------------------------------------------------------------------
# Sequence-parallel ViM mixer forward


def _halo_conv(x, conv_w, conv_b, axis_name: str):
    """Depthwise causal conv across shard boundaries: pull the previous
    shard's last (width−1) steps via ppermute, prepend, convolve, trim."""
    width = conv_w.shape[0]
    ndev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    halo = x[:, -(width - 1):, :]
    if ndev > 1:
        perm = [(i, i + 1) for i in range(ndev - 1)]
        halo_in = lax.ppermute(halo, axis_name, perm)
    else:
        halo_in = jnp.zeros_like(halo)
    halo_in = jnp.where(idx >= 1, halo_in, jnp.zeros_like(halo_in))
    xx = jnp.concatenate([halo_in, x], axis=1)
    y = causal_conv1d(xx, conv_w, conv_b, activation="silu")
    return y[:, width - 1:, :]


def _ring_direction(x_bld, z_bld, p, A, axis_name, impl, reverse):
    """One scan direction of a ViM/DBM mixer, sequence-sharded.

    x/z: (b, l_shard, d_inner) in FORWARD time order. For reverse=True the
    conv halo comes from the NEXT shard and the conv runs on flipped time
    (exactly flip→conv→scan→flip of the reference direction), then the ring
    chains shards anti-causally."""
    if reverse:
        # anti-causal conv: halo is the FIRST (w-1) steps of the next shard
        width = p["conv_w"].shape[0]
        ndev = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)
        halo = x_bld[:, : width - 1, :]
        if ndev > 1:
            perm = [(i, i - 1) for i in range(1, ndev)]
            halo_in = lax.ppermute(halo, axis_name, perm)
        else:
            halo_in = jnp.zeros_like(halo)
        halo_in = jnp.where(idx < ndev - 1, halo_in,
                            jnp.zeros_like(halo_in))
        xx = jnp.flip(jnp.concatenate([x_bld, halo_in], axis=1), axis=1)
        xc = causal_conv1d(xx, p["conv_w"], p.get("conv_bias"),
                           activation="silu")[:, width - 1:, :]
        xc = jnp.flip(xc, axis=1)                     # forward order again
    else:
        xc = _halo_conv(x_bld, p["conv_w"], p.get("conv_bias"), axis_name)

    d_state = A.shape[1]
    dt_rank = p["dt_proj"].shape[0]
    x_dbl = jnp.dot(xc, p["x_proj"].astype(xc.dtype))
    dt = jnp.dot(x_dbl[..., :dt_rank], p["dt_proj"].astype(xc.dtype))
    Bv = x_dbl[..., dt_rank : dt_rank + d_state]
    Cv = x_dbl[..., dt_rank + d_state :]
    return _shard_body(xc, dt, A, Bv, Cv, p["D"], z_bld, p["dt_bias"],
                       True, axis_name, impl, reverse)


def ring_mamba_vim(
    mesh: Mesh,
    params,
    x: jax.Array,
    axis_name: str = "seq",
    impl: str = "auto",
    if_devide_out: bool = False,
    batch_axis: Optional[str] = None,
):
    """Sequence-parallel MambaVim forward: x (batch, L, d_model) with L
    sharded over `axis_name`; params = a MambaVim parameter tree
    ({'params': {in_proj, fwd{…}, bwd{…}, out_proj}} or the inner dict).

    Bidirectional = one causal ring (fwd params) + one anti-causal ring
    (bwd params), exactly MambaVim.__call__'s flip semantics (SURVEY §5:
    'for bidirectional ViM/DBM do one ring each direction').

    `batch_axis`: mesh axis the batch dim is sharded over, for composed
    data × sequence parallelism on a 2-D mesh (see ring_selective_scan).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "assoc"
    p = params.get("params", params)
    d_inner = p["fwd"]["A_log"].shape[0]
    A_f = -jnp.exp(p["fwd"]["A_log"])
    A_b = -jnp.exp(p["bwd"]["A_log"])
    w_in = p["in_proj"]["kernel"]
    w_out = p["out_proj"]["kernel"]
    fwd_p, bwd_p = p["fwd"], p["bwd"]

    def body(x):
        xz = jnp.dot(x, w_in.astype(x.dtype))
        xs, zs = xz[..., :d_inner], xz[..., d_inner:]
        out_f = _ring_direction(xs, zs, fwd_p, A_f, axis_name, impl, False)
        out_b = _ring_direction(xs, zs, bwd_p, A_b, axis_name, impl, True)
        out = out_f + out_b
        if if_devide_out:
            out = out / 2
        return jnp.dot(out, w_out.astype(out.dtype))

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(batch_axis, axis_name, None),),
        out_specs=P(batch_axis, axis_name, None),
        check_vma=False,
    )
    return f(x)
