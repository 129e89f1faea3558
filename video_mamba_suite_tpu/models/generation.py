"""Autoregressive generation for Mamba LMs — jitted scan decode loop.

Capability match for /root/reference/mamba/mamba_ssm/utils/generation.py:
InferenceParams (:18), top-k/top-p sampling (:63), the greedy/sample decode
loop (:93) and GenerationMixin (:203). The CUDA-graph caching machinery
(DecodingCGCache:243, capture_graph:330) is obsolete under XLA: the entire
token loop is one compiled `lax.scan` over functional per-layer
(conv_state, ssm_state) states, so there is no per-step dispatch to hide.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class GenerationConfig:
    max_length: int = 128
    top_k: int = 1            # 1 = greedy
    top_p: float = 0.0        # 0 = disabled
    temperature: float = 1.0
    eos_token_id: Optional[int] = None


def sample_logits(key, logits: jax.Array, top_k: int = 1, top_p: float = 0.0,
                  temperature: float = 1.0) -> jax.Array:
    """Top-k / top-p / temperature sampling (generation.py:28-90)."""
    if top_k == 1 and top_p == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / max(temperature, 1e-6)
    vocab = logits.shape[-1]
    if 0 < top_k < vocab:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    model,
    params,
    input_ids: jax.Array,
    config: GenerationConfig = GenerationConfig(),
    rng: Optional[jax.Array] = None,
    prefill: bool = True,
) -> jax.Array:
    """Prefill the prompt, then decode with sampling.

    input_ids: (batch, prompt_len) → (batch, max_length) generated ids
    (prompt included), greedy when top_k==1 and top_p==0.

    prefill=True (default) runs ONE full-sequence forward over the prompt
    (the fused-scan kernels + `return_last_state`) and only decodes the
    generated suffix token-by-token — the analogue of the reference's
    seqlen_offset=0 prefill forward (utils/generation.py:93-150), replacing
    prompt_len sequential steps with batched MXU matmuls. prefill=False
    keeps the pure step-loop path (used by the parity tests; also the
    fallback for mixers without a `prefill` method). Greedy outputs are
    identical either way; sampled outputs draw the same distribution but a
    different key stream (the step loop burns one split per prompt token).

    The decode loop is `lax.scan`-compiled; wrap in jax.jit for repeated use.
    """
    batch, prompt_len = input_ids.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step_fn(carry, t):
        token, states, key = carry
        logits, states = model.apply(params, token, states, method="step")
        key, sub = jax.random.split(key)
        sampled = sample_logits(
            sub, logits, config.top_k, config.top_p, config.temperature
        ).astype(input_ids.dtype)
        if not prefill:
            # step-loop path: force the prompt token instead of the sample
            in_prompt = t + 1 < prompt_len
            padded_prompt = jnp.pad(
                input_ids, ((0, 0), (0, 1))
            )  # avoid OOB gather at t+1 == prompt_len
            prompt_tok = lax.dynamic_index_in_dim(
                padded_prompt, jnp.minimum(t + 1, prompt_len), axis=1,
                keepdims=False,
            )
            sampled = jnp.where(in_prompt, prompt_tok, sampled)
        return (sampled, states, key), sampled

    if not prefill:
        states = model.init_states(batch)
        init = (input_ids[:, 0], states, rng)
        _, tokens = lax.scan(step_fn, init, jnp.arange(config.max_length - 1))
        return jnp.concatenate(
            [input_ids[:, :1], jnp.swapaxes(tokens, 0, 1)], axis=1)

    genlen = config.max_length - prompt_len
    assert genlen >= 1, (
        f"max_length {config.max_length} must exceed prompt_len {prompt_len}"
    )
    logits, states = model.apply(params, input_ids, method="prefill")
    rng, sub = jax.random.split(rng)
    first = sample_logits(
        sub, logits, config.top_k, config.top_p, config.temperature
    ).astype(input_ids.dtype)
    pieces = [input_ids, first[:, None]]
    if genlen > 1:
        _, tokens = lax.scan(
            step_fn, (first, states, rng), jnp.arange(genlen - 1))
        pieces.append(jnp.swapaxes(tokens, 0, 1))
    return jnp.concatenate(pieces, axis=1)
