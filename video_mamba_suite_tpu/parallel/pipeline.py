"""Pipeline parallelism over a 'stage' mesh axis (GPipe-style, SPMD).

The reference has no pipeline parallelism anywhere (SURVEY.md §2.4 — its
distributed story is data-parallel only); this is a beyond-reference
capability axis, matching how deep Mamba stacks scale past one chip's HBM.

TPU-native design: the layer stack is split into S stages, one per device
along a 'stage' mesh axis. Parameters are stacked with a leading (S, L/S)
axis and sharded over 'stage', so each device stores only its own layers.
Execution is the standard single-program collective-permute pipeline (the
shard_map analogue of GPipe): every device runs M + S - 1 ticks; on tick t,
stage s computes microbatch t - s, then the activation ring rotates one hop
via `lax.ppermute` over ICI. Stage 0 injects fresh microbatches, the last
stage records outputs; the (S-1)-tick bubble is the usual GPipe cost and
shrinks with more microbatches. Gradients flow through ppermute/psum
transposes, so `jax.grad` of a pipelined loss just works — no separate
backward schedule to hand-write.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leading(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    microbatches: Any,
    axis: str = "stage",
) -> Any:
    """Run `stage_fn` as an S-stage pipeline over the `axis` mesh axis.

    Args:
      stage_fn: (one stage's params, activation) -> activation. The
        activation is any pytree; its structure must be preserved.
      stage_params: pytree whose leaves carry a leading stage axis of size
        S = mesh.shape[axis] (shard with `pp_stack_params` or equivalent).
      microbatches: pytree whose leaves carry a leading microbatch axis M
        (replicated across the mesh).

    Returns the last stage's outputs with the same structure/leading axis as
    `microbatches`, replicated across the mesh.
    """
    S = mesh.shape[axis]
    n_micro = _leading(microbatches)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(params_local, mbs):
        sid = lax.axis_index(axis)
        # local param view has a leading stage axis of 1 — drop it
        p_own = jax.tree.map(lambda x: x[0], params_local)
        # the carry becomes device-varying inside the loop (sid-dependent
        # injection + ppermute); mark the invariant zero init as varying so
        # lax.scan's carry types are stable
        vary = lambda x: lax.pcast(x, (axis,), to="varying")
        state = jax.tree.map(lambda l: vary(jnp.zeros_like(l[0])), mbs)

        def tick(state, t):
            inj = jax.tree.map(
                lambda l: lax.dynamic_index_in_dim(
                    l, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False),
                mbs,
            )
            valid_in = (sid == 0) & (t < n_micro)
            state = jax.tree.map(
                lambda i, s: jnp.where(valid_in, i, s), inj, state)
            state = stage_fn(p_own, state)
            # after compute, the LAST stage holds microbatch t-(S-1) done:
            # emit it as this tick's y (O(1) data movement per tick — no
            # whole-buffer select)
            y = state
            state = jax.tree.map(
                lambda s: lax.ppermute(s, axis, perm), state)
            return state, y

        _, ys = lax.scan(tick, state, jnp.arange(n_micro + S - 1))
        # ticks S-1 .. M+S-2 on the LAST stage are microbatches 0..M-1;
        # everywhere else ys is pipeline garbage — mask and replicate
        outputs = jax.tree.map(lambda y: y[S - 1:], ys)
        return jax.tree.map(
            lambda o: lax.psum(jnp.where(sid == S - 1, o, 0), axis), outputs)

    f = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
    )
    return f(stage_params, microbatches)


def pp_stack_params(
    layer_params: List[Any],
    n_stages: int,
    mesh: Optional[Mesh] = None,
    axis: str = "stage",
) -> Any:
    """Stack per-layer param trees into (S, L/S, ...) leaves; shard over axis.

    `layer_params` is a list of structurally-identical pytrees (one per
    layer, pipeline order). Layers are dealt to stages contiguously:
    stage s owns layers [s·L/S, (s+1)·L/S).
    """
    n_layers = len(layer_params)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"pipeline: {n_layers} layers not divisible by {n_stages} stages")
    per = n_layers // n_stages
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layer_params)
    stacked = jax.tree.map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked)
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis))
        stacked = jax.tree.map(
            lambda x: jax.device_put(x, sharding), stacked)
    return stacked


def split_microbatches(x: jax.Array, n_micro: int) -> jax.Array:
    """(B, ...) -> (M, B/M, ...) microbatch-major view."""
    if x.shape[0] % n_micro != 0:
        raise ValueError(
            f"pipeline: batch {x.shape[0]} not divisible by {n_micro} "
            "microbatches")
    return x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])


def pp_mamba_blocks(
    mesh: Mesh,
    block: Any,
    stage_params: Any,
    x: jax.Array,
    n_microbatches: int,
    axis: str = "stage",
):
    """Pipeline a stack of pre-norm Mamba Blocks (the universal inner stack,
    SURVEY.md §3.2) over the 'stage' mesh axis.

    Args:
      block: a `models.mamba.Block` module instance (shared by all layers —
        the per-layer differences live in the params).
      stage_params: output of `pp_stack_params` over the per-layer Block
        variable trees, leaves (S, L/S, ...).
      x: (batch, seqlen, d_model) input; batch must divide by
        n_microbatches.

    Returns (hidden, residual), each (batch, seqlen, d_model) — feed
    `hidden + residual` (or the model's final fused_add_norm) downstream,
    exactly like a sequential Block stack.
    """
    def stage_fn(p_stage, act):
        # lax.scan over the stage's layer stack keeps the HLO O(1) in
        # depth (the tunneled remote-compile service rejects big programs,
        # and unrolled layers would also duplicate into the scan transpose)
        def layer(carry, p_i):
            h, res = carry
            h, res = block.apply(p_i, h, res)
            return (h, res), None

        (h, res), _ = lax.scan(layer, act, p_stage)
        return (h, res)

    # residual stream dtype must match what Block actually returns, or the
    # pipeline tick's lax.scan carry type flips after the first layer
    res_dtype = (jnp.float32 if getattr(block, "residual_in_fp32", True)
                 else x.dtype)
    mbs = (
        split_microbatches(x, n_microbatches),
        split_microbatches(
            jnp.zeros(x.shape, res_dtype), n_microbatches),
    )
    h, res = pipeline_apply(mesh, stage_fn, stage_params, mbs, axis=axis)
    merge = lambda m: m.reshape((-1,) + m.shape[2:])
    return merge(h), merge(res)
