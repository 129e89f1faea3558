"""Expert parallelism: a Switch-style MoE MLP sharded over an 'expert' axis.

The reference has no mixture-of-experts anywhere (SURVEY.md §2.4); this is a
beyond-reference capability axis (MoE-Mamba-style scaling) that completes the
framework's parallelism matrix: data / tensor / sequence / pipeline / expert.

TPU-native design (GShard/Switch dense-dispatch, the GSPMD idiom):
  - top-1 gating with a capacity cap C = ceil(tokens/E · capacity_factor);
    overflow tokens are dropped (their output is the zero residual-delta,
    the standard Switch behavior).
  - dispatch/combine are dense one-hot einsums, so the whole layer is three
    MXU matmuls + masks — no ragged shapes, no host control flow.
  - expert weights carry a leading E axis sharded over the 'expert' mesh
    axis; `with_sharding_constraint` pins the dispatched activations
    (E, C, d) to the same axis and XLA inserts the all-to-alls.
  - the Switch load-balancing auxiliary loss (E · Σ_e fraction_e · prob_e)
    is returned alongside the output.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def moe_dispatch(
    gate_logits: jax.Array, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-1 dispatch/combine tensors from (N, E) gate logits.

    Returns (dispatch (N, E, C) {0,1}, combine (N, E, C) = dispatch·prob,
    aux_loss scalar).
    """
    n, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(probs, axis=-1)                    # (N,)
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (N, E)
    # position of each token within its expert's queue (first-come order)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0        # (N, E), -1 off
    keep = (pos >= 0) & (pos < capacity)
    dispatch = jax.nn.one_hot(
        jnp.where(keep, pos, -1).astype(jnp.int32), capacity,
        dtype=jnp.float32) * keep[..., None]               # (N, E, C)
    top_prob = jnp.max(probs, axis=-1)                     # (N,)
    combine = dispatch * top_prob[:, None, None]
    # Switch aux loss: E · Σ_e (tokens routed to e / N) · mean prob_e
    frac = jnp.mean(onehot, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac * mean_prob)
    return dispatch, combine, aux


class MoEMlp(nn.Module):
    """Switch-style top-1 MoE MLP (GELU), expert-parallel under a mesh.

    Drop-in for a dense MLP on (B, L, d) tokens; returns (out, aux_loss).
    Pass `mesh` to pin expert-major tensors to the 'expert' axis (GSPMD
    inserts the a2a collectives); without a mesh it runs single-device.

    `group_size` keeps the dense dispatch masks LINEAR in token count (the
    GShard token-grouping): tokens are routed in independent groups of g
    with per-group capacity ceil(g/E·cf), so the (G, g, E, C) masks are
    O(N·g·cf/E) instead of O(N²·cf/E). -1 (default) groups per batch row —
    the natural choice for sequence models, and it makes single-token
    decode (g = 1) drop-free automatically. 0 = one flat group over all
    B·L tokens (first-come routing across the whole batch).
    """

    d_model: int
    d_hidden: int
    num_experts: int = 4
    capacity_factor: float = 1.25
    group_size: int = -1
    mesh: Optional[Mesh] = None
    axis: str = "expert"
    group_axis: Optional[str] = None  # composed data x expert parallelism:
    # also pin the token-group dim over this mesh axis (groups follow batch
    # rows, so a batch sharded over 'data' keeps dispatch local to the data
    # shard and the a2a rides only the 'expert' axis)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, l, d = x.shape
        e, h = self.num_experts, self.d_hidden
        n = b * l
        if self.group_size == -1:
            g = l
        elif self.group_size == 0:
            g = n
        else:
            g = self.group_size
            if n % g != 0:
                raise ValueError(
                    f"MoEMlp: {n} tokens not divisible by group_size {g}")
        ngroups = n // g
        cap = max(1, math.ceil(g / e * self.capacity_factor))

        gate_w = self.param("gate", nn.initializers.lecun_normal(), (d, e),
                            jnp.float32)
        w1 = self.param("w1", nn.initializers.lecun_normal(), (e, d, h),
                        jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (e, h), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(), (e, h, d),
                        jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), jnp.float32)

        tok = x.reshape(ngroups, g, d)
        logits = jnp.einsum("gnd,de->gne", tok.astype(jnp.float32), gate_w)
        dispatch, combine, aux = jax.vmap(
            moe_dispatch, in_axes=(0, None))(logits, cap)
        aux = jnp.mean(aux)

        cd = self.dtype
        xe = jnp.einsum("gnec,gnd->gecd", dispatch.astype(cd),
                        tok.astype(cd))
        if self.mesh is not None:
            xe = jax.lax.with_sharding_constraint(
                xe, NamedSharding(self.mesh, P(self.group_axis, self.axis)))
        hmid = jax.nn.gelu(
            jnp.einsum("gecd,edh->gech", xe, w1.astype(cd)) +
            b1.astype(cd)[None, :, None], approximate=True)
        ye = jnp.einsum("gech,ehd->gecd", hmid, w2.astype(cd)) + \
            b2.astype(cd)[None, :, None]
        if self.mesh is not None:
            ye = jax.lax.with_sharding_constraint(
                ye, NamedSharding(self.mesh, P(self.group_axis, self.axis)))
        out = jnp.einsum("gnec,gecd->gnd", combine.astype(cd), ye)
        return out.reshape(b, l, d).astype(x.dtype), aux


def ep_shard_params(mesh: Mesh, params: dict, axis: str = "expert") -> dict:
    """Shard a MoEMlp param tree: expert-major leaves over `axis`, gate
    replicated."""
    def put(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = P() if name == "gate" else P(axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
