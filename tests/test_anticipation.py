"""Anticipation: model shapes, streaming == batch consistency, e2e learn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.anticipation import (
    AnticipationTrainer,
    LSTRMamba,
    perframe_average_precision,
    topk_recall,
)
from video_mamba_suite_tpu.tasks.anticipation.metrics import marginalize


def _model(**kw):
    defaults = dict(
        visual_dim=16, motion_dim=8, d_model=32, num_classes=4,
        long_memory_num_samples=8, work_memory_num_samples=6,
        anticipation_num_samples=2, mamba_layers=2, impl="ref",
    )
    defaults.update(kw)
    return LSTRMamba(**defaults)


def _inputs(rng, B=2, model=None):
    T = model.long_memory_num_samples + model.work_memory_num_samples
    k1, k2 = jax.random.split(rng)
    visual = jax.random.normal(k1, (B, T, model.visual_dim))
    motion = jax.random.normal(k2, (B, T, model.motion_dim))
    return visual, motion


def test_shapes():
    model = _model()
    visual, motion = _inputs(jax.random.PRNGKey(0), model=model)
    params = model.init({"params": jax.random.PRNGKey(1)}, visual, motion)
    out = model.apply(params, visual, motion)
    # work (6) + anticipation (2) positions
    assert out["score"].shape == (2, 8, 4)


def test_verb_noun_heads():
    model = _model(num_verbs=3, num_nouns=5)
    visual, motion = _inputs(jax.random.PRNGKey(0), model=model)
    params = model.init({"params": jax.random.PRNGKey(1)}, visual, motion)
    out = model.apply(params, visual, motion)
    assert out["score_verb"].shape == (2, 8, 3)
    assert out["score_noun"].shape == (2, 8, 5)


def test_streaming_matches_batch():
    """Feeding fused tokens one by one through stream_step must equal the
    full causal forward (long memory disabled, no anticipation queries, no
    positional encoding differences ⇒ compare the last positions)."""
    model = LSTRMamba(
        visual_dim=8, motion_dim=0, d_model=16, num_classes=3,
        long_memory_num_samples=0, work_memory_num_samples=5,
        anticipation_num_samples=0, mamba_layers=1, impl="ref",
    )
    visual = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8))
    params = model.init({"params": jax.random.PRNGKey(1)}, visual, None)
    out_full = model.apply(params, visual, None)["score"]

    # streaming: embed each work token (+ the same sinusoid PE) then step
    from video_mamba_suite_tpu.models.common import sinusoid_positions

    pe = sinusoid_positions(5, 16)
    states = model.apply(params, 1, method="init_stream")
    outs = []
    for t in range(5):
        tok = model.apply(params, visual[:, t], None,
                          method="embed_work_token")
        tok = tok + pe[t][None].astype(tok.dtype)
        logits, states = model.apply(params, tok, states, method="stream_step")
        outs.append(logits)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(out_full), rtol=2e-3, atol=2e-3
    )


def test_stream_prefill_matches_steps():
    """stream_prefill must produce the step loop's scores AND leave the
    states exactly where L stream_step calls would (so streaming can
    continue seamlessly after a one-pass warm-up)."""
    model = LSTRMamba(
        visual_dim=8, motion_dim=0, d_model=16, num_classes=3,
        long_memory_num_samples=0, work_memory_num_samples=5,
        anticipation_num_samples=0, mamba_layers=2, impl="ref",
    )
    visual = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    params = model.init({"params": jax.random.PRNGKey(1)}, visual, None)

    toks = jnp.stack(
        [model.apply(params, visual[:, t], None, method="embed_work_token")
         for t in range(5)], axis=1)

    states = model.apply(params, 2, method="init_stream")
    outs = []
    for t in range(5):
        logits, states = model.apply(params, toks[:, t], states,
                                     method="stream_step")
        outs.append(logits)
    stepped = jnp.stack(outs, axis=1)

    pre_scores, pre_states = model.apply(params, toks,
                                         method="stream_prefill")
    np.testing.assert_allclose(np.asarray(pre_scores), np.asarray(stepped),
                               rtol=2e-3, atol=2e-3)
    for (c1, s1), (c2, s2) in zip(pre_states, states):
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-3, atol=1e-3)

    # continuing the stream from the prefilled states matches continuing
    # from the stepped states
    nxt = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    l1, _ = model.apply(params, nxt, pre_states, method="stream_step")
    l2, _ = model.apply(params, nxt, states, method="stream_step")
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-3, atol=2e-3)


def test_metrics():
    scores = np.array([[0.1, 0.8, 0.1], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]])
    labels = np.array([1, 0, 2])
    res = perframe_average_precision(scores, labels, ignore_index=None)
    assert res["mean_AP"] == 1.0
    assert topk_recall(scores, labels, k=1) == 100.0
    a2v = np.array([0, 0, 1])
    v = marginalize(scores, a2v, 2)
    np.testing.assert_allclose(v[:, 0], scores[:, 0] + scores[:, 1])


@pytest.mark.slow
def test_anticipation_learns():
    rng = np.random.default_rng(0)
    model = _model(num_classes=3, impl="assoc")
    T = model.long_memory_num_samples + model.work_memory_num_samples
    P = model.work_memory_num_samples + model.anticipation_num_samples
    protos = rng.standard_normal((3, 16)) * 2
    B = 16
    labels = rng.integers(0, 3, (B, P))
    visual = 0.3 * rng.standard_normal((B, T, 16)).astype(np.float32)
    # plant class signal at the work/anticipation positions
    for b in range(B):
        for p in range(model.work_memory_num_samples):
            visual[b, model.long_memory_num_samples + p] += protos[labels[b, p]]
        # anticipation targets = last work label (predictable)
        labels[b, model.work_memory_num_samples:] = labels[
            b, model.work_memory_num_samples - 1
        ]
    motion = np.zeros((B, T, 8), np.float32)
    targets = labels.astype(np.int32)

    trainer = AnticipationTrainer(model, lr=2e-3)
    for _ in range(60):
        loss = trainer.train_step(visual, motion, targets)
    res = trainer.evaluate(visual, motion, targets)
    assert res["recall@5"] == 100.0  # 3 classes, top-5 trivially covers
    assert res["mean_AP"] > 0.8, (res, loss)
