"""Tensor parallelism for Mamba mixers over a 'model' mesh axis.

The reference has no TP anywhere (SURVEY.md §2.4); Mamba is *naturally*
tensor-parallel: the selective scan is independent per channel, so sharding
d_inner across devices needs no communication in the recurrence — only the
Megatron pattern around it:

    in_proj    column-parallel (output dim sharded)       — no comm
    conv1d     depthwise, local                           — no comm
    x_proj     row-parallel contraction over d_inner      — psum (tiny:
               dt_rank + 2·d_state per token)
    dt_proj    column-parallel                            — no comm
    scan       local channels                             — no comm
    out_proj   row-parallel                               — psum

Two small all-reduces per direction; the recurrence itself never talks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.causal_conv1d import causal_conv1d
from ..ops.mamba_inner import MASKED_DELTA
from ..ops.selective_scan import selective_scan

def _dir_spec(keys, axis: str):
    table = {
        "conv_w": P(None, axis),
        "conv_bias": P(axis),
        "x_proj": P(axis, None),
        "dt_proj": P(None, axis),
        "dt_bias": P(axis),
        "A_log": P(axis, None),
        "D": P(axis),
    }
    return {k: table[k] for k in keys}


def tp_shard_params(mesh: Mesh, params: dict, axis: str = "model") -> dict:
    """Shard a (replicated) MambaVim parameter tree with d_inner over `axis`.

    in_proj columns are [x (d_inn); z (d_inn)]: the two halves are
    interleaved per shard so each device's local columns are its own
    [x_local; z_local] pair.
    """
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    p = params["params"]
    d_in = p["fwd"]["dt_bias"].shape[0]
    n = mesh.shape[axis]

    k = p["in_proj"]["kernel"]
    x_w = k[:, :d_in].reshape(k.shape[0], n, d_in // n)
    z_w = k[:, d_in:].reshape(k.shape[0], n, d_in // n)
    inter = jnp.concatenate([x_w, z_w], axis=2).reshape(k.shape[0], 2 * d_in)

    out = {"params": {"in_proj": {"kernel": put(inter, P(None, axis))}}}
    for d in ("fwd", "bwd"):
        spec = _dir_spec(p[d].keys(), axis)
        out["params"][d] = {kk: put(v, spec[kk]) for kk, v in p[d].items()}
    out["params"]["out_proj"] = {
        "kernel": put(p["out_proj"]["kernel"], P(axis, None))
    }
    return out


def tp_mamba_forward(
    mesh: Mesh,
    params: dict,
    hidden_states: jax.Array,
    mask: Optional[jax.Array] = None,
    axis: str = "model",
    if_devide_out: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """MambaVim forward with d_inner sharded over `axis`."""
    p = params["params"]
    has_mask = mask is not None
    if mask is None:
        mask = jnp.ones(hidden_states.shape[:2], hidden_states.dtype)

    def run_direction(direction, xz_local, m):
        dl = xz_local.shape[-1] // 2            # local d_inner
        x, z = xz_local[..., :dl], xz_local[..., dl:]
        if has_mask:
            mm = m.astype(x.dtype)[..., None]
            x, z = x * mm, z * mm
        x = causal_conv1d(x, direction["conv_w"], direction.get("conv_bias"),
                          activation="silu")
        # row-parallel x_proj: partial contraction + tiny psum
        x_dbl = jax.lax.psum(
            jnp.dot(x, direction["x_proj"].astype(x.dtype)), axis
        )
        dt_rank = direction["dt_proj"].shape[0]
        d_state = direction["A_log"].shape[1]
        dt = jnp.dot(x_dbl[..., :dt_rank],
                     direction["dt_proj"].astype(x.dtype))
        if has_mask:
            dt = jnp.where(m[..., None] > 0, dt, MASKED_DELTA)
        B = x_dbl[..., dt_rank : dt_rank + d_state]
        C = x_dbl[..., dt_rank + d_state :]
        return selective_scan(
            x, dt, -jnp.exp(direction["A_log"]), B, C,
            D=direction["D"], z=z, delta_bias=direction["dt_bias"],
            delta_softplus=True, impl=impl,
        )

    def local(h, in_w, fwd, bwd, out_w, m):
        xz = jnp.dot(h, in_w.astype(h.dtype))   # column-parallel
        out_f = run_direction(fwd, xz, m)
        out_b = jnp.flip(
            run_direction(bwd, jnp.flip(xz, axis=1), jnp.flip(m, axis=1)),
            axis=1,
        )
        out = out_f + out_b
        if if_devide_out:
            out = out / 2
        y = jnp.dot(out, out_w.astype(out.dtype))  # row-parallel
        return jax.lax.psum(y, axis)

    fwd = {k: v for k, v in p["fwd"].items()}
    bwd = {k: v for k, v in p["bwd"].items()}
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis), _dir_spec(fwd.keys(), axis),
                  _dir_spec(bwd.keys(), axis), P(axis, None), P()),
        out_specs=P(),
    )
    return f(hidden_states, p["in_proj"]["kernel"], fwd, bwd,
             p["out_proj"]["kernel"], mask)
