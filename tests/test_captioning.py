"""PDVC: deformable attention oracle check, matcher, criterion, metrics, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.ops.deform_attn import (
    MSDeformAttn1D,
    ms_deform_attn_core,
)
from video_mamba_suite_tpu.tasks.captioning import (
    PDVC,
    CaptioningTrainer,
    bleu4,
    cider_d,
    evaluate_dvc,
    hungarian_match,
    pdvc_losses,
    rouge_l,
    soda_c,
)
from video_mamba_suite_tpu.tasks.captioning.matcher import match_cost


def test_deform_attn_core_oracle():
    """Single head/level/point at an exact grid center must return that
    element's value."""
    B, T, H, D = 1, 8, 1, 4
    value = jnp.arange(B * T * H * D, dtype=jnp.float32).reshape(B, T, H, D)
    # sample exactly at element 3: normalized loc = (3 + 0.5) / 8
    loc = jnp.full((B, 1, H, 1, 1), (3 + 0.5) / 8)
    w = jnp.ones((B, 1, H, 1, 1))
    out = ms_deform_attn_core(value, [T], loc, w)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(value[0, 3, 0]), rtol=1e-5
    )


def test_deform_attn_core_interpolates():
    B, T, H, D = 1, 4, 1, 1
    value = jnp.asarray([0.0, 1.0, 2.0, 3.0]).reshape(B, T, H, D)
    # halfway between elements 1 and 2 → 1.5; normalized (2.0+0)/4 = 0.5
    loc = jnp.full((B, 1, H, 1, 1), 0.5)
    w = jnp.ones((B, 1, H, 1, 1))
    out = ms_deform_attn_core(value, [T], loc, w)
    np.testing.assert_allclose(float(out[0, 0, 0]), 1.5, rtol=1e-5)


def test_msdeform_module_shapes():
    mod = MSDeformAttn1D(d_model=16, n_levels=2, n_heads=4, n_points=2)
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    src = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))  # levels 8+4
    ref = jax.random.uniform(jax.random.PRNGKey(2), (2, 5, 2, 1))
    params = mod.init(jax.random.PRNGKey(3), q, ref, src, [8, 4])
    out = mod.apply(params, q, ref, src, [8, 4])
    assert out.shape == (2, 5, 16)


def test_hungarian_match():
    # 3 queries, 2 valid GTs: cost forces q2→g0, q0→g1
    cost = jnp.asarray([
        [[5.0, 1.0, 1e6], [9.0, 7.0, 1e6], [1.0, 8.0, 1e6]],
    ])
    idx = hungarian_match(cost, jnp.asarray([2]))
    assert list(np.asarray(idx[0])) == [2, 0, -1]


def test_pdvc_losses_perfect_match():
    B, Q, G, C = 1, 4, 2, 3
    gt_boxes = jnp.asarray([[[0.3, 0.2], [0.7, 0.1]]])
    gt_labels = jnp.asarray([[1, 2]])
    gt_valid = jnp.asarray([[True, True]])
    match_idx = jnp.asarray([[0, 1]])
    logits = jnp.full((B, Q, C), -10.0)
    logits = logits.at[0, 0, 1].set(10.0).at[0, 1, 2].set(10.0)
    boxes = jnp.zeros((B, Q, 2)).at[0, 0].set(gt_boxes[0, 0]).at[0, 1].set(
        gt_boxes[0, 1]
    )
    counts = jnp.zeros((B, 11)).at[0, 2].set(100.0)
    out = dict(pred_logits=logits, pred_boxes=boxes, pred_count=counts)
    losses = pdvc_losses(out, gt_boxes, gt_labels, gt_valid, match_idx)
    assert float(losses["loss_bbox"]) < 1e-6
    assert float(losses["loss_giou"]) < 1e-4
    assert float(losses["loss_count"]) < 1e-3
    assert float(losses["loss_label"]) < 1e-2


def test_caption_metrics():
    assert bleu4("a man is cooking", ["a man is cooking"]) > 0.99
    assert bleu4("totally different words here", ["a man is cooking"]) < 0.1
    assert rouge_l("a man is cooking", ["a man is cooking"]) == 1.0
    # CIDEr needs a multi-document corpus for non-zero idf
    hyps = ["a man is cooking", "a dog runs fast", "kids play soccer"]
    refs = [[h] for h in hyps]
    c = cider_d(hyps, refs)
    assert c > 5.0  # perfect matches score high (max 10)
    c_bad = cider_d(["nothing relevant here", "words words", "foo bar"], refs)
    assert c_bad < c

    # protocol evaluator: two perfectly-localized, perfectly-captioned
    # events in one video (≥2 instances so the per-video CIDEr idf —
    # computed per compute_score call, i.e. per video — is non-zero)
    preds = {"v1": [
        dict(timestamp=[0, 10], sentence="a man cooks dinner", score=0.9),
        dict(timestamp=[20, 30], sentence="a dog runs fast", score=0.8),
    ]}
    gt = {"v1": [
        dict(timestamp=[0, 10], sentence="a man cooks dinner"),
        dict(timestamp=[20, 30], sentence="a dog runs fast"),
    ]}
    res = evaluate_dvc(preds, gt)
    assert res["recall"] == 100.0 and res["precision"] == 100.0
    assert res["BLEU4"] > 99.0
    # METEOR-1.5: a perfect 4-word match scores (1 − γ·(1/4)^β) ≈ 0.545,
    # NOT ~1.0 — the 1.5 fragmentation penalty (β=0.2) keeps even perfect
    # matches well below 1 (jar behavior; meteor.py)
    assert 45.0 < res["METEOR"] < 65.0
    assert res["ROUGE_L"] == 100.0
    assert res["CIDEr"] > 500.0  # perfect match = raw 10 → 1000 after x100
    assert 45.0 < soda_c(preds, gt) < 65.0   # reward capped by the same
    # 1.5 penalty: tIoU 1.0 × METEOR ≈ 0.545 per perfectly-matched event


@pytest.mark.slow
def test_pdvc_end_to_end_trains():
    """Loss decreases and boxes move toward GT on a synthetic task."""
    rng = np.random.default_rng(0)
    B, T, C = 2, 64, 12
    model = PDVC(input_dim=C, num_classes=1, vocab_size=12, num_queries=6,
                 d_model=32, n_levels=2, num_encoder_layers=1,
                 num_decoder_layers=2, max_caption_len=5, impl="assoc")
    trainer = CaptioningTrainer(model, lr=3e-4)

    # one event per video with a feature bump; caption = fixed token seq per class
    feats = 0.2 * rng.standard_normal((B, T, C)).astype(np.float32)
    gt_boxes = np.zeros((B, 4, 2), np.float32)
    gt_labels = np.zeros((B, 4), np.int32)
    gt_valid = np.zeros((B, 4), bool)
    captions = np.full((B, 4, 6), -100, np.int64)
    for b in range(B):
        s, e = 16 + 8 * b, 32 + 8 * b
        feats[b, s:e] += 2.0
        gt_boxes[b, 0] = [(s + e) / 2 / T, (e - s) / T]
        gt_valid[b, 0] = True
        captions[b, 0] = [0, 3, 4, 5, 6, 0]  # BOS … EOS

    mask = np.ones((B, T), np.float32)
    losses0 = trainer.train_step(feats, mask, gt_boxes, gt_labels, gt_valid,
                                 captions)
    for _ in range(60):
        losses = trainer.train_step(feats, mask, gt_boxes, gt_labels,
                                    gt_valid, captions)
    assert losses["loss_total"] < losses0["loss_total"]
    assert losses["loss_bbox"] < 0.2, losses
    # decode produces events
    events = trainer.predict(feats, mask, duration=float(T))
    assert len(events) == B and len(events[0]) > 0


def test_dsa_caption_head_standard():
    """The published configs' caption_decoder_type 'standard' = LSTM-DSA
    (cfgs/anet_c3d_pdvc.yml:4, CaptioningHead/LSTM_DSA.py:189-336): per
    decode step deformable sampling around the event box + additive
    attention pooling conditioned on the LSTM state."""
    import numpy as np

    from video_mamba_suite_tpu.tasks.captioning.model import (
        PDVC,
        pdvc_level_shapes,
    )
    from video_mamba_suite_tpu.tasks.captioning.train import CaptioningTrainer

    assert pdvc_level_shapes(64, 3) == (64, 32, 16)
    assert pdvc_level_shapes(7, 3) == (7, 4, 2)

    rng = np.random.default_rng(0)
    B, T, C = 2, 32, 8
    model = PDVC(input_dim=C, num_classes=1, vocab_size=11, num_queries=4,
                 d_model=16, n_levels=2, num_encoder_layers=1,
                 num_decoder_layers=1, max_caption_len=4,
                 caption_decoder_type="standard", impl="ref")
    tr = CaptioningTrainer(model, lr=1e-3)
    feats = 0.2 * rng.standard_normal((B, T, C)).astype(np.float32)
    gt_boxes = np.tile(np.array([[0.5, 0.4]], np.float32), (B, 2, 1))
    gt_labels = np.zeros((B, 2), np.int32)
    gt_valid = np.ones((B, 2), bool)
    captions = np.tile(np.array([[0, 3, 4, 0]], np.int64), (B, 2, 1))
    mask = np.ones((B, T), np.float32)

    first = None
    for _ in range(8):
        losses = tr.train_step(feats, mask, gt_boxes, gt_labels, gt_valid,
                               captions)
        first = first if first is not None else float(losses["loss_total"])
    assert float(losses["loss_total"]) < first  # it learns
    events = tr.predict(feats, mask, duration=float(T), topk=2)
    assert len(events) == B and "sentence" in events[0][0]
    # param tree includes the DSA-specific projections
    flat = str(jax.tree_util.tree_structure(tr.params))
    for name in ("sampling_offsets", "value_proj", "alpha_net"):
        assert name in flat, name


def test_caption_decoder_type_none_proposal_only():
    """caption_decoder_type 'none' = proposal-only training
    (cfgs/anet_c3d_props.yml, opts.py:224): no caption head params, no
    caption loss, predict returns events with empty sentences."""
    import numpy as np

    from video_mamba_suite_tpu.tasks.captioning.model import PDVC
    from video_mamba_suite_tpu.tasks.captioning.train import CaptioningTrainer

    rng = np.random.default_rng(0)
    B, T, C = 2, 32, 8
    model = PDVC(input_dim=C, num_classes=1, vocab_size=11, num_queries=4,
                 d_model=16, n_levels=2, num_encoder_layers=1,
                 num_decoder_layers=1, caption_decoder_type="none",
                 impl="ref")
    tr = CaptioningTrainer(model, lr=1e-3)
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    losses = tr.train_step(
        feats, mask,
        np.tile(np.array([[0.5, 0.4]], np.float32), (B, 2, 1)),
        np.zeros((B, 2), np.int32), np.ones((B, 2), bool),
        np.zeros((B, 2, 4), np.int64))
    assert "loss_caption" not in losses
    assert "caption_head" not in str(jax.tree_util.tree_structure(tr.params))
    events = tr.predict(feats, mask, duration=float(T), topk=2)
    assert events[0][0]["sentence"] == ""


def test_two_phase_matching_equals_callback_path():
    """The no-host-callback fallback (jitted cost fwd → host LSA → jitted
    prematched grad step, used on the axon TPU runtime which rejects
    pure_callback) must be bit-identical to the single-dispatch callback
    path: the same rng drives both forwards, so dropout masks — and hence
    the matching and the gradients — coincide exactly."""
    rng = np.random.default_rng(0)
    B, T, C = 2, 32, 8
    model = PDVC(input_dim=C, num_classes=1, vocab_size=12, num_queries=6,
                 d_model=32, n_levels=2, num_encoder_layers=1,
                 num_decoder_layers=2, max_caption_len=5, impl="assoc")
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    gt_boxes = np.tile(np.array([[0.3, 0.2], [0.7, 0.1]], np.float32),
                       (B, 1, 1))
    gt_labels = np.zeros((B, 2), np.int32)
    gt_valid = np.ones((B, 2), bool)
    caps = np.array([[[0, 3, 4, 5, 0], [0, 6, 7, 8, 0]]] * B, np.int64)

    tr_cb = CaptioningTrainer(model, seed=7)
    tr_2p = CaptioningTrainer(model, seed=7)
    tr_2p._use_callback = False
    for _ in range(3):
        l_cb = tr_cb.train_step(feats, mask, gt_boxes, gt_labels, gt_valid,
                                caps)
        l_2p = tr_2p.train_step(feats, mask, gt_boxes, gt_labels, gt_valid,
                                caps)
        assert l_cb.keys() == l_2p.keys()
        for key in l_cb:
            assert l_cb[key] == l_2p[key], (key, l_cb[key], l_2p[key])
