"""VTG tests: model shapes, losses, target construction, metrics, e2e learn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.vtg import (
    UniVTGMamba,
    VtgTrainer,
    build_targets,
    compute_mr_ap,
    compute_mr_r1,
    make_synthetic_vtg,
    vtg_losses,
)
from video_mamba_suite_tpu.tasks.vtg.data import collate_vtg
from video_mamba_suite_tpu.tasks.vtg.losses import generalized_temporal_iou


def test_model_shapes():
    model = UniVTGMamba(txt_dim=12, vid_dim=20, embed_dim=32, depth=2,
                        impl="assoc")
    B, Lt, Lv = 2, 5, 16
    txt = jax.random.normal(jax.random.PRNGKey(0), (B, Lt, 12))
    vid = jax.random.normal(jax.random.PRNGKey(1), (B, Lv, 20))
    tm, vm = jnp.ones((B, Lt)), jnp.ones((B, Lv))
    params = model.init({"params": jax.random.PRNGKey(2)}, txt, tm, vid, vm)
    out = model.apply(params, txt, tm, vid, vm)
    assert out["pred_logits"].shape == (B, Lv, 1)
    assert out["pred_spans"].shape == (B, Lv, 2)
    assert out["saliency_scores"].shape == (B, Lv)
    # span offsets: left ≤ 0, right ≥ 0 (sigmoid × (−1, 1))
    assert bool(jnp.all(out["pred_spans"][..., 0] <= 0))
    assert bool(jnp.all(out["pred_spans"][..., 1] >= 0))


def test_build_targets_window_indicator():
    t = build_targets(ctx_l=10, relevant_windows=[[4.0, 12.0]], clip_len=2.0)
    # window [4, 12] sec over 10 clips × 2 s → normalized [0.2, 0.6];
    # timestamps (i + 1) * 0.2 / 2 … clip centers in [0.2, 0.6] are positives
    # clip centers are (i+1)/10; [0.2, 0.6] normalized covers indices 1–5
    # (5 can fall out by fp rounding, matching the reference arithmetic)
    win = t["timestamp_window"]
    assert win.sum() >= 1
    inside = np.nonzero(win)[0]
    assert inside.min() >= 1 and inside.max() <= 5
    np.testing.assert_allclose(t["span_labels_nn"][inside][0], [0.2, 0.6], atol=1e-6)


def test_losses_finite_and_zero_for_perfect():
    samples = make_synthetic_vtg(num_samples=4, ctx_l=16)
    batch = collate_vtg(samples, max_q_l=8, max_v_l=16)
    B, Lv = 4, 16
    outputs = dict(
        pred_logits=jnp.asarray(batch["timestamp_window"])[..., None],
        pred_spans=jnp.asarray(batch["span_labels_nn"] - batch["timestamp"]),
        vid_mem_proj=jax.random.normal(jax.random.PRNGKey(0), (B, Lv, 8)),
        txt_mem_proj=jax.random.normal(jax.random.PRNGKey(1), (B, 1, 8)),
    )
    targets = {k: jnp.asarray(batch[k]) for k in (
        "timestamp", "timestamp_mask", "timestamp_window", "span_labels_nn",
        "saliency_scores", "saliency_pos_labels")}
    losses = vtg_losses(outputs, targets)
    assert all(bool(jnp.isfinite(v)) for v in losses.values())
    # perfect spans ⇒ zero span/giou loss
    np.testing.assert_allclose(float(losses["loss_b"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(losses["loss_g"]), 0.0, atol=1e-4)


def test_giou_identity():
    s = jnp.array([[0.1, 0.5], [0.2, 0.9]])
    np.testing.assert_allclose(
        np.asarray(generalized_temporal_iou(s, s)), 1.0, atol=1e-5
    )


def test_mr_metrics():
    gt = [dict(qid=1, relevant_windows=[[10.0, 30.0]])]
    sub = [dict(qid=1, pred_relevant_windows=[[10.0, 30.0, 0.9]],
                pred_saliency_scores=[0.1])]
    ap = compute_mr_ap(sub, gt)
    assert ap["average"] == 100.0
    r1, miou = compute_mr_r1(sub, gt)
    assert miou == 100.0
    bad = [dict(qid=1, pred_relevant_windows=[[50.0, 60.0, 0.9]],
                pred_saliency_scores=[0.1])]
    assert compute_mr_ap(bad, gt)["average"] == 0.0


@pytest.mark.slow
def test_vtg_end_to_end_learns():
    samples = make_synthetic_vtg(num_samples=8, ctx_l=32, txt_dim=12,
                                 vid_dim=12)
    trainer = VtgTrainer(txt_dim=12, vid_dim=12, embed_dim=32, depth=2,
                         lr=5e-4, max_q_l=6, max_v_l=32, impl="assoc",
                         input_dropout=0.0)
    for _ in range(25):
        stats = trainer.train_epoch(samples, batch_size=4)
    assert np.isfinite(stats["loss_total"])
    res = trainer.evaluate(samples)
    assert res["mIoU@1"] > 35.0, (res, stats)
    assert res["HL_hit1"] > 50.0, res
