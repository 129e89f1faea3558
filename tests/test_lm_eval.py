"""LM scoring utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from video_mamba_suite_tpu.models import MambaLMHeadModel
from video_mamba_suite_tpu.models.lm_eval import (
    perplexity,
    sequence_loglikelihood,
)


def test_loglikelihood_and_perplexity():
    model = MambaLMHeadModel(d_model=32, n_layer=2, vocab_size=40)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0, 40)
    params = model.init(jax.random.PRNGKey(1), ids)
    mask = jnp.ones_like(ids, jnp.float32)
    ll = sequence_loglikelihood(model, params, ids, mask)
    assert ll.shape == (2,)
    assert bool(jnp.all(ll < 0))
    ppl = perplexity(model, params, ids)
    # untrained → roughly uniform over padded vocab (40)
    assert 10 < ppl < 200, ppl

    # scoring only a continuation: masking fewer tokens raises ll
    part = mask.at[:, :8].set(0.0)
    ll_part = sequence_loglikelihood(model, params, ids, part)
    assert bool(jnp.all(ll_part >= ll))
