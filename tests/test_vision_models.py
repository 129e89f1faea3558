"""Vision backbones (ViViM, TimeMamba), CLIP dual encoder, losses, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models.clip import CLIP, TextTransformer
from video_mamba_suite_tpu.models.timemamba import TimeMamba
from video_mamba_suite_tpu.models.vivim import ViViM
from video_mamba_suite_tpu.tasks.egocentric import (
    calculate_mAP,
    calculate_nDCG,
    clip_loss,
    create_relevancy_matrix,
    max_margin_ranking_loss,
    sharded_clip_loss,
)
from video_mamba_suite_tpu.tasks.egocentric.metrics import get_mAP, get_nDCG
from video_mamba_suite_tpu.tasks.recognition import (
    merge_multi_view,
    mixup_cutmix,
    topk_accuracy,
)


def test_vivim_shapes():
    model = ViViM(img_size=32, patch_size=16, num_frames=2, depth=2,
                  embed_dim=32, output_dim=16, impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x)
    assert out.shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vivim_bidirectional_and_classifier():
    model = ViViM(img_size=32, patch_size=16, num_frames=2, depth=2,
                  embed_dim=32, num_classes=7, if_bidirectional=True,
                  impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x)
    assert out.shape == (1, 7)


def test_timemamba_shapes():
    model = TimeMamba(img_size=32, patch_size=16, embed_dim=32, depth=2,
                      num_heads=4, num_frames=2, output_dim=16, impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x)
    assert out.shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_clip_forward_and_loss():
    model = CLIP(
        embed_dim=16, vision_tower="vivim",
        vision_cfg=dict(img_size=32, patch_size=16, num_frames=2, depth=2,
                        embed_dim=32, impl="assoc"),
        text_cfg=dict(context_length=8, vocab_size=100, width=32, heads=4,
                      layers=2),
    )
    videos = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    texts = jax.random.randint(jax.random.PRNGKey(1), (3, 8), 0, 100)
    params = model.init({"params": jax.random.PRNGKey(2)}, videos, texts)
    img, txt, scale = model.apply(params, videos, texts)
    assert img.shape == (3, 16) and txt.shape == (3, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-4
    )
    loss = clip_loss(img, txt, scale)
    assert bool(jnp.isfinite(loss))


def test_clip_loss_perfect_alignment():
    f = jax.nn.one_hot(jnp.arange(4), 8)
    loss = clip_loss(f, f, jnp.asarray(100.0))
    assert float(loss) < 1e-3
    # shuffled pairing → big loss
    loss_bad = clip_loss(f, f[::-1], jnp.asarray(100.0))
    assert float(loss_bad) > 10


def test_sharded_clip_loss_matches_plain():
    from video_mamba_suite_tpu.parallel import make_mesh

    mesh = make_mesh(8, axes=("data",))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    img = jax.random.normal(k1, (16, 8))
    txt = jax.random.normal(k2, (16, 8))
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.asarray(10.0)
    plain = clip_loss(img, txt, scale)
    sharded = sharded_clip_loss(mesh, img, txt, scale)
    np.testing.assert_allclose(float(sharded), float(plain), rtol=1e-5)


def test_max_margin_ranking():
    sim = jnp.eye(4) * 1.0  # perfect: diag 1, off-diag 0, margin 0.2 → 0 loss
    assert float(max_margin_ranking_loss(sim, margin=0.2)) == 0.0
    sim_bad = jnp.ones((4, 4))
    assert float(max_margin_ranking_loss(sim_bad, margin=0.2)) > 0


def test_mir_metrics_perfect_retrieval():
    classes = np.array([0, 1, 2, 0])
    rel = create_relevancy_matrix(classes, classes)
    sim = rel + 0.01 * np.random.default_rng(0).standard_normal(rel.shape)
    v, t, avg = get_mAP(sim, rel)
    assert avg > 0.99
    v2, t2, avg2 = get_nDCG(sim, rel)
    assert avg2 > 0.99
    # anti-correlated similarity → low mAP
    v3, _, avg3 = get_mAP(-sim, rel)
    assert avg3 < avg


def test_mixup_cutmix_targets_sum_to_one():
    rng = jax.random.PRNGKey(0)
    videos = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3])
    mixed, targets = mixup_cutmix(rng, videos, labels, num_classes=5,
                                  smoothing=0.1)
    assert mixed.shape == videos.shape
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-5)


def test_multi_view_merge_and_topk():
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4], [0.3, 0.7]])
    vids = np.array([0, 0, 1, 1])
    uniq, merged = merge_multi_view(probs, vids)
    assert merged.shape == (2, 2)
    np.testing.assert_allclose(merged[0], [0.55, 0.45])
    acc = topk_accuracy(merged, np.array([0, 1]), ks=(1,))
    assert acc["top1"] == 100.0


def test_vivim_scan_blocks():
    """nn.scan block stacking: same API/shape, O(1)-depth HLO."""
    model = ViViM(img_size=32, patch_size=16, num_frames=2, depth=4,
                  embed_dim=32, output_dim=16, scan_blocks=True,
                  impl="assoc")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x)
    assert out.shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(out)))
    # stacked params: one block with a leading depth axis
    mixers = params["params"]["blocks"]["mixer"]
    leaf = jax.tree_util.tree_leaves(mixers)[0]
    assert leaf.shape[0] == 4


def test_vivim_dual_stream_matches_single():
    """ViViM dual_stream (multi-stream phase-shifted schedule through the
    shared-param scanned ViM stack, mirroring TimeMamba's) is a pure
    schedule change: same param tree, same outputs; non-divisible batches
    fall back to the single-stream schedule."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 32, 32, 3))
    outs, trees = {}, {}
    for dual in (False, True, 4):
        model = ViViM(img_size=32, patch_size=16, num_frames=2, depth=4,
                      embed_dim=32, output_dim=16, scan_blocks=True,
                      impl="assoc", dual_stream=dual)
        params = model.init({"params": jax.random.PRNGKey(1)}, x)
        trees[dual] = jax.tree.structure(params)
        outs[dual] = np.asarray(model.apply(params, x))
        # non-divisible batch: numerically-identical fallback
        out1 = model.apply(params, x[:1])
        assert out1.shape == (1, 16)
    assert trees[True] == trees[False] == trees[4]
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[4], outs[False], rtol=2e-5, atol=2e-5)


def test_timemamba_dual_stream_matches_single():
    """dual_stream=True (two half-batch streams through the shared-param
    scanned block stack — the r11 phase-shifted schedule that overlaps one
    stream's VPU scan with the other's MXU matmuls on the chip) is a pure
    SCHEDULE change: outputs must match the single-stream path bitwise-ish
    (fp reassociation tolerance only)."""
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 32, 32, 3))
    outs = {}
    for dual in (False, True, 4):  # 4-stream is the bench.py default
        model = TimeMamba(img_size=32, patch_size=16, embed_dim=64, depth=4,
                          num_heads=4, num_frames=4, ln_pre=True,
                          output_dim=32, impl="ref", scan_blocks=True,
                          dual_stream=dual)
        # init batch must divide by the stream count (the ns=4 case)
        params = model.init({"params": jax.random.PRNGKey(1)}, x)
        outs[dual] = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[4], outs[False], rtol=2e-5, atol=2e-5)


def test_timemamba_dual_stream_guards():
    """dual_stream needs scan_blocks; non-divisible batches (batch-1 eval,
    shape-probing init) silently fall back to the numerically-identical
    single-stream schedule with the SAME param tree (this broke bench.py's
    batch-1 init when the guard was a hard assert)."""
    import pytest

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
    model = TimeMamba(img_size=32, patch_size=16, embed_dim=32, depth=2,
                      num_heads=4, num_frames=2, ln_pre=True, output_dim=16,
                      impl="ref", scan_blocks=False, dual_stream=True)
    with pytest.raises(AssertionError, match="scan_blocks"):
        model.init({"params": jax.random.PRNGKey(1)}, x)

    kw = dict(img_size=32, patch_size=16, embed_dim=32, depth=2,
              num_heads=4, num_frames=2, ln_pre=True, output_dim=16,
              impl="ref", scan_blocks=True)
    dual = TimeMamba(**kw, dual_stream=4)
    single = TimeMamba(**kw, dual_stream=False)
    # init on a batch the stream count does NOT divide, apply on one it does
    params = dual.init({"params": jax.random.PRNGKey(1)}, x[:1])
    ref_params = single.init({"params": jax.random.PRNGKey(1)}, x[:1])
    assert jax.tree.structure(params) == jax.tree.structure(ref_params)
    out1 = dual.apply(params, x[:1])     # fallback path
    ref1 = single.apply(params, x[:1])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=2e-5, atol=2e-5)


def test_patchify_conv_matches_nn_conv():
    """PatchifyConv (im2col matmul lowering) is bit-compatible with the
    stride-p VALID nn.Conv it replaced: same param tree, same values,
    same gradients (benchmarks/r7_patch_embed.py measured the conv
    lowering's filter-grad pass 67x slower on TPU)."""
    from flax import linen as nn

    from video_mamba_suite_tpu.models.common import PatchifyConv

    p, D = 8, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 19, 24, 3))  # 19: VALID tail-crop
    conv = nn.Conv(D, (p, p), strides=(p, p), padding="VALID", name="pe")
    mm = PatchifyConv(D, patch_size=p, name="pe")
    params = conv.init(jax.random.PRNGKey(1), x)
    # identical parameter tree (checkpoint compatibility)
    assert jax.tree_util.tree_structure(
        mm.init(jax.random.PRNGKey(1), x)) == \
        jax.tree_util.tree_structure(params)

    a = conv.apply(params, x)
    b = mm.apply(params, x)
    assert a.shape == b.shape == (2, 2, 3, D)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(2), a.shape)
    ga = jax.grad(lambda pr, xx: jnp.sum(conv.apply(pr, xx) * g),
                  argnums=(0, 1))(params, x)
    gb = jax.grad(lambda pr, xx: jnp.sum(mm.apply(pr, xx) * g),
                  argnums=(0, 1))(params, x)
    for la, lb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-5)

    # bf16 compute-dtype mode (the TimeMamba site)
    a16 = nn.Conv(D, (p, p), strides=(p, p), padding="VALID",
                  dtype=jnp.bfloat16, name="pe").apply(
                      params, x.astype(jnp.bfloat16))
    b16 = PatchifyConv(D, patch_size=p, dtype=jnp.bfloat16, name="pe").apply(
        params, x.astype(jnp.bfloat16))
    assert b16.dtype == a16.dtype
    np.testing.assert_allclose(np.asarray(a16, np.float32),
                               np.asarray(b16, np.float32),
                               rtol=3e-2, atol=3e-2)
