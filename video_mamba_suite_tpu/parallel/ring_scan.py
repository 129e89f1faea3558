"""Sequence-parallel selective scan over a mesh axis.

The reference handles long sequences only *inside* one GPU kernel (chunked
cub::BlockScan with carried prefix, selective_scan_fwd_kernel.cuh:131-254);
no cross-device sequence parallelism exists anywhere in the suite
(SURVEY.md §2.4/§5). This module adds it, TPU-native: shard the time axis L
over a mesh axis, run the local chunked scan on each shard, and chain shards
by exchanging (∏a, last_state) prefixes — the associative-scan analogue of
ring attention.

Key identity making the exchange cheap: a_t = exp(dt_t·A), so the total decay
over a shard is ∏_t a_t = exp((Σ_t dt_t)·A) — an O(b·d·n) tensor computed
from one reduction, no second scan needed. The incoming prefix state h0 is
then folded into local outputs via

    y_t += Σ_n C_t[n] · exp(cumsum(dt)_t · A[d,n]) · h0[d,n]

which XLA fuses into one elementwise+reduction pass. D-skip and SiLU(z)
gating are applied after the correction (they are per-timestep local).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.selective_scan import selective_scan


def _local_shard_scan(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                      axis_name: str, impl: str):
    """Body run per device under shard_map; u/delta/B/C/z sharded on L."""
    dtf = delta.astype(jnp.float32)
    if delta_bias is not None:
        dtf = dtf + delta_bias.astype(jnp.float32)
    if delta_softplus:
        dtf = jax.nn.softplus(dtf)

    # Local scan with zero initial state, no gating/skip (applied after the
    # prefix correction).
    out_local, last = selective_scan(
        u, delta, A, B, C, D=None, z=None, delta_bias=delta_bias,
        delta_softplus=delta_softplus, return_last_state=True, impl=impl,
    )
    out_local = out_local.astype(jnp.float32)

    # Shard-total decay ∏_t a_t = exp((Σ_t dt)·A):  (b, d, n)
    a_prod = jnp.exp(jnp.sum(dtf, axis=1)[..., None] * A[None])

    # Exclusive prefix over the device axis: h0 = fold of all earlier shards.
    idx = lax.axis_index(axis_name)
    a_all = lax.all_gather(a_prod, axis_name)        # (ndev, b, d, n)
    s_all = lax.all_gather(last, axis_name)          # (ndev, b, d, n)
    ndev = a_all.shape[0]
    h0 = jnp.zeros_like(last)
    for j in range(ndev):
        take = j < idx
        h0 = jnp.where(take, a_all[j] * h0 + s_all[j], h0)

    # Fold h0 into local outputs: y_t += C_t · (exp(cumsum(dt)_t·A) ⊙ h0)
    cs = jnp.cumsum(dtf, axis=1)                      # (b, l, d)
    decay = jnp.exp(cs[..., None] * A[None, None])    # (b, l, d, n) fused
    corr = jnp.einsum("bldn,bdn,bln->bld", decay, h0, C.astype(jnp.float32))
    y = out_local + corr

    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, None]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(u.dtype)


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
    impl: str = "assoc",
) -> jax.Array:
    """Selective scan with the time axis sharded over `axis_name`.

    Shapes as selective_scan (time-major); seqlen must divide the mesh axis
    size. Differentiable end-to-end (use impl='assoc' for a differentiable
    last_state; the Pallas path gains initial-state support later).
    """
    specs = dict(
        u=P(None, axis_name, None), delta=P(None, axis_name, None),
        A=P(), B=P(None, axis_name, None), C=P(None, axis_name, None),
        D=P(), z=P(None, axis_name, None), delta_bias=P(),
    )
    in_specs = [specs["u"], specs["delta"], specs["A"], specs["B"], specs["C"]]
    args = [u, delta, A, B, C]
    # optional args enter as positional with their own specs
    in_specs += [P() if D is not None else P(),
                 specs["z"] if z is not None else P(),
                 P()]
    args += [D if D is not None else jnp.zeros((1,), jnp.float32),
             z if z is not None else jnp.zeros((1, 1, 1), u.dtype),
             delta_bias if delta_bias is not None else jnp.zeros((1,), jnp.float32)]

    has_d, has_z, has_bias = D is not None, z is not None, delta_bias is not None

    def body(u, delta, A, B, C, D_, z_, bias_):
        return _local_shard_scan(
            u, delta, A, B, C,
            D_ if has_d else None,
            z_ if has_z else None,
            bias_ if has_bias else None,
            delta_softplus, axis_name, impl,
        )

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axis_name, None),
    )
    return f(*args)
