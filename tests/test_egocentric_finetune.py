"""EK100 finetune engines: MIR (MaxMargin CLIP finetune + mAP/nDCG eval)
and CLS (VideoClassifier + top-1/5 + verb/noun marginalization).

Reference parity targets: engine/main_lavila_finetune_mir.py (train :369,
validate_mir :488-572) and main_lavila_finetune_cls.py (VideoClassifier,
validate :505-560) + evaluation_ek100cls helpers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models.clip import CLIP
from video_mamba_suite_tpu.models.vivim import ViViM
from video_mamba_suite_tpu.tasks.egocentric.finetune import (
    ClsFinetuner,
    MirFinetuner,
    VideoClassifier,
)
from video_mamba_suite_tpu.tasks.egocentric.metrics import (
    create_relevancy_matrix,
    get_marginal_indexes,
    get_mean_accuracy,
    marginalize,
)


def _tiny_clip():
    return CLIP(
        embed_dim=16, vision_tower="vivim",
        vision_cfg=dict(img_size=16, patch_size=8, num_frames=2, depth=1,
                        embed_dim=16, impl="assoc"),
        text_cfg=dict(context_length=6, vocab_size=60, width=16, heads=2,
                      layers=1),
    )


def _clip_batch(rng, n):
    videos = rng.standard_normal((n, 2, 16, 16, 3)).astype(np.float32)
    texts = rng.integers(1, 60, (n, 6)).astype(np.int32)
    return videos, texts


def test_mir_finetune_step_and_eval():
    rng = np.random.default_rng(0)
    videos, texts = _clip_batch(rng, 6)
    ft = MirFinetuner(_tiny_clip(), lr=1e-3)
    l0 = ft.train_step(videos, texts)
    assert np.isfinite(l0)
    for _ in range(3):
        loss = ft.train_step(videos, texts)
    assert np.isfinite(loss)

    classes = np.array([0, 0, 1, 1, 2, 2])
    rel = create_relevancy_matrix(classes, classes)
    res = ft.evaluate(videos, texts, rel, batch_size=4)
    for k in ("avg_map", "avg_ndcg", "vis_map", "txt_ndcg"):
        assert 0.0 <= res[k] <= 1.0


def test_mir_eval_perfect_embeddings_score_1():
    """If video/text embeddings coincide per class, mAP and nDCG hit 1."""
    rng = np.random.default_rng(1)
    videos, texts = _clip_batch(rng, 4)
    ft = MirFinetuner(_tiny_clip())
    ft.init(videos[:1], texts[:1])

    classes = np.array([0, 0, 1, 1])
    rel = create_relevancy_matrix(classes, classes)
    # bypass the encoder: inject orthogonal per-class embeddings
    emb = np.eye(4, 16)[[0, 0, 1, 1]].astype(np.float32)
    ft.encode_dataset = lambda v, t, batch_size=8: (emb, emb)
    res = ft.evaluate(videos, texts, rel)
    assert res["avg_map"] == pytest.approx(1.0)
    assert res["avg_ndcg"] == pytest.approx(1.0)


def test_cls_finetuner_learns_and_marginalizes():
    rng = np.random.default_rng(2)
    n, n_act = 12, 4
    videos = rng.standard_normal((n, 2, 16, 16, 3)).astype(np.float32)
    labels = np.arange(n) % n_act
    # make classes separable: bias each video by its label
    for i, l in enumerate(labels):
        videos[i] += 2.0 * (l - 1.5)

    tower = ViViM(img_size=16, patch_size=8, num_frames=2, depth=1,
                  embed_dim=16, num_classes=0, impl="assoc")
    ft = ClsFinetuner(tower, num_classes=n_act, lr=1e-2, dropout=0.0,
                      smoothing=0.0, mixup_alpha=0.0, cutmix_alpha=0.0,
                      warmup_steps=5, total_steps=300)
    for _ in range(60):
        loss = ft.train_step(videos, labels.astype(np.int32))
    assert np.isfinite(loss)
    # actions 0,1 share verb 0; actions 2,3 share verb 1
    a2v = get_marginal_indexes(np.array([0, 0, 1, 1]))
    res = ft.evaluate(videos, labels, action_to_verb=a2v)
    assert res["action_top1"] > 50.0, res
    assert res["verb_top1"] >= res["action_top1"] - 1e-6
    assert 0 <= res["action_top5"] <= 100


def test_cls_multicrop_eval_merges():
    rng = np.random.default_rng(3)
    tower = ViViM(img_size=16, patch_size=8, num_frames=2, depth=1,
                  embed_dim=16, num_classes=0, impl="assoc")
    ft = ClsFinetuner(tower, num_classes=3, dropout=0.0)
    videos = rng.standard_normal((4, 2, 2, 16, 16, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 0])
    ft.init(videos[:1, 0])
    res = ft.evaluate(videos, labels)
    assert "action_top1" in res and np.isfinite(res["action_top1"])


def test_videoclassifier_head_shape():
    tower = ViViM(img_size=16, patch_size=8, num_frames=2, depth=1,
                  embed_dim=16, num_classes=0, impl="assoc")
    model = VideoClassifier(vision_tower=tower, num_classes=7, dropout=0.1)
    x = jnp.zeros((2, 2, 16, 16, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(params, x)
    assert out.shape == (2, 7)


def test_marginalize_and_mean_accuracy():
    probs = np.array([[0.1, 0.2, 0.3, 0.4],
                      [0.4, 0.3, 0.2, 0.1]])
    idx = get_marginal_indexes(np.array([0, 0, 1, 1]))
    m = marginalize(probs, idx)
    np.testing.assert_allclose(m, [[0.3, 0.7], [0.7, 0.3]])
    cm = np.array([[3, 1], [0, 4]])
    mean_acc, overall = get_mean_accuracy(cm)
    assert overall == pytest.approx(100 * 7 / 8)
    assert mean_acc == pytest.approx(100 * (0.75 + 1.0) / 2)


def test_mir_finetune_init_from_pretrained_params():
    """The finetune engine adopts pretrained CLIP params (the reference's
    --resume load of a pretrain checkpoint)."""
    rng = np.random.default_rng(4)
    videos, texts = _clip_batch(rng, 2)
    model = _tiny_clip()
    pre = model.init({"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(7)},
                     jnp.asarray(videos[:1]), jnp.asarray(texts[:1]),
                     deterministic=True)
    ft = MirFinetuner(model)
    ft.init(videos[:1], texts[:1], params=pre)
    leaf_pre = jax.tree_util.tree_leaves(pre)[0]
    leaf_ft = jax.tree_util.tree_leaves(ft.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf_pre), np.asarray(leaf_ft))
