"""Contrastive losses for CLIP pretraining, mesh-native.

Reference: /root/reference/video-mamba-suite/egocentric-understanding/
avion/losses/losses.py — ClipLoss with NCCL all_gather of global-batch
features (:18-137) and MaxMarginRankingLoss (:140-170).

TPU-native design: under pjit with the batch sharded over the 'data' mesh
axis, the full-batch similarity matrix `img @ txt.T` makes XLA insert the
all-gather automatically — `clip_loss` is therefore a pure function (the
GSPMD equivalent of `gather_features`). `sharded_clip_loss` is the explicit
shard_map variant (lax.all_gather + per-shard CE), matching the reference's
`local_loss=True` mode, for cases where manual control beats GSPMD.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ce_with_diag_labels(logits: jax.Array, label_offset: int = 0) -> jax.Array:
    """Cross entropy with labels = diag indices (+offset for local loss)."""
    n = logits.shape[0]
    labels = jnp.arange(n) + label_offset
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[jnp.arange(n), labels])


def clip_loss(image_features: jax.Array, text_features: jax.Array,
              logit_scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the (global) batch (losses.py:85-137).

    Features must be L2-normalized. Call inside pjit with batch sharded over
    'data'; XLA gathers the global batch for the similarity matmul.
    """
    logits_per_image = logit_scale * image_features @ text_features.T
    logits_per_text = logits_per_image.T
    return 0.5 * (
        _ce_with_diag_labels(logits_per_image)
        + _ce_with_diag_labels(logits_per_text)
    )


def sharded_clip_loss(mesh: Mesh, image_features, text_features, logit_scale,
                      axis_name: str = "data"):
    """Explicit local-loss variant: each shard computes its rows against the
    all-gathered global features (gather_features + local_loss=True,
    losses.py:18-62). Returns the global mean loss."""

    def local(img, txt, scale):
        all_txt = jax.lax.all_gather(txt, axis_name)
        all_img = jax.lax.all_gather(img, axis_name)
        ndev, b = all_txt.shape[0], img.shape[0]
        all_txt = all_txt.reshape(ndev * b, -1)
        all_img = all_img.reshape(ndev * b, -1)
        rank = jax.lax.axis_index(axis_name)
        offset = rank * b
        logits_i = scale * img @ all_txt.T
        logits_t = scale * txt @ all_img.T
        loss = 0.5 * (
            _ce_with_diag_labels(logits_i, offset)
            + _ce_with_diag_labels(logits_t, offset)
        )
        return jax.lax.pmean(loss, axis_name)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P()),
        out_specs=P(),
    )
    return f(image_features, text_features, logit_scale)


def max_margin_ranking_loss(sim_matrix: jax.Array, margin: float = 0.2
                            ) -> jax.Array:
    """MaxMarginRankingLoss (losses.py:140-170): hinge on off-diagonal pairs
    vs the matched diagonal, both directions."""
    n = sim_matrix.shape[0]
    diag = jnp.diag(sim_matrix)
    cost_im = jnp.maximum(0.0, margin + sim_matrix - diag[:, None])
    cost_txt = jnp.maximum(0.0, margin + sim_matrix - diag[None, :])
    eye = jnp.eye(n, dtype=bool)
    cost_im = jnp.where(eye, 0.0, cost_im)
    cost_txt = jnp.where(eye, 0.0, cost_txt)
    return (jnp.sum(cost_im) + jnp.sum(cost_txt)) / (n * max(n - 1, 1) * 2)
