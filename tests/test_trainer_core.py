"""Every task trainer runs a mesh-sharded (data-parallel) step on the
8-device CPU mesh and survives an orbax save/restore round trip.

This is the TPU equivalent of the reference's per-suite DDP + torch.save
contracts (SURVEY.md §2.4/§5): params replicated, batch sharded over 'data',
XLA inserts the gradient all-reduce.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.utils.trainer import TrainerCore

N_DEV = len(jax.devices())
pytestmark = pytest.mark.skipif(N_DEV < 8, reason="needs 8 virtual devices")


def _assert_replicated(params):
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert len(leaf.sharding.device_set) == N_DEV


def _roundtrip(trainer, tmp_path, step=1):
    """save → mutate params → restore → params match the saved values."""
    d = os.path.join(str(tmp_path), "ckpt")
    saved = jax.tree_util.tree_map(np.asarray, trainer.state_dict()["params"])
    trainer.save(d, step)
    trainer.params = jax.tree_util.tree_map(lambda x: x * 0.0, trainer.params)
    trainer.load_state_dict(trainer.core.restore(d, trainer.state_dict()))
    restored = jax.tree_util.tree_map(np.asarray, trainer.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, saved, restored)
    _assert_replicated(trainer.params)


def test_tas_mesh_step_and_ckpt(tmp_path):
    from video_mamba_suite_tpu.tasks.tas.data import collate, make_synthetic_dataset
    from video_mamba_suite_tpu.tasks.tas.train import TasTrainer

    data = make_synthetic_dataset(num_videos=8, num_classes=3, feat_dim=8)
    trainer = TasTrainer(num_classes=3, input_dim=8, num_layers=1,
                         num_f_maps=8, num_decoders=1,
                         channel_masking_rate=0.0, impl="assoc",
                         use_mesh=True)

    class Gen:
        def __init__(self, items):
            self.items, self.i = items, 0

        def has_next(self):
            return self.i < len(self.items)

        def next_batch(self, bs, if_warp=False):
            chunk = self.items[self.i : self.i + bs]
            self.i += bs
            return collate(chunk, pad_to=16) + (["v"] * len(chunk),)

        def reset(self):
            self.i = 0

    stats = trainer.train_epoch(Gen(data), batch_size=8)
    assert np.isfinite(stats["loss"])
    _assert_replicated(trainer.params)
    _roundtrip(trainer, tmp_path)


def test_tal_mesh_step_and_ckpt(tmp_path):
    from video_mamba_suite_tpu.tasks.tal.data import collate_tal, make_synthetic_tal
    from video_mamba_suite_tpu.tasks.tal.train import TalTrainer

    items = make_synthetic_tal(num_videos=8, num_classes=2, feat_dim=8,
                               seq_len=64)
    trainer = TalTrainer(
        input_dim=8, num_classes=2, max_seq_len=64, embd_dim=16,
        backbone_arch=(1, 1, 2),
        regression_range=[(0, 8), (8, 32), (32, 10000)],
        impl="assoc", max_num_gt=4, use_mesh=True,
    )
    feats, mask, segs, labels, valid = collate_tal(items, 64, 4, training=True)
    losses = trainer.train_step(feats, mask, segs, labels, valid)
    assert np.isfinite(losses["final_loss"])
    _assert_replicated(trainer.params)
    # TAL has its own save/restore carrying EMA + loss_norm
    d = os.path.join(str(tmp_path), "tal")
    saved = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer.save(d, 1)
    trainer.params = jax.tree_util.tree_map(lambda x: x * 0.0, trainer.params)
    trainer.restore(d, feats, mask)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, saved,
        jax.tree_util.tree_map(np.asarray, trainer.params),
    )


def test_vtg_mesh_step_and_ckpt(tmp_path):
    from video_mamba_suite_tpu.tasks.vtg.data import make_synthetic_vtg
    from video_mamba_suite_tpu.tasks.vtg.train import VtgTrainer

    samples = make_synthetic_vtg(num_samples=8, ctx_l=16, txt_dim=8, vid_dim=8)
    trainer = VtgTrainer(txt_dim=8, vid_dim=8, embed_dim=16, depth=1,
                         max_q_l=4, max_v_l=16, impl="assoc",
                         input_dropout=0.0, use_mesh=True)
    stats = trainer.train_epoch(samples, batch_size=8)
    assert np.isfinite(stats["loss_total"])
    _assert_replicated(trainer.params)
    _roundtrip(trainer, tmp_path)


def test_anticipation_mesh_step_and_ckpt(tmp_path):
    from video_mamba_suite_tpu.tasks.anticipation.model import LSTRMamba
    from video_mamba_suite_tpu.tasks.anticipation.train import AnticipationTrainer

    model = LSTRMamba(visual_dim=8, motion_dim=4, d_model=16, num_classes=3,
                      long_memory_num_samples=4, work_memory_num_samples=4,
                      anticipation_num_samples=1, mamba_layers=1, impl="ref")
    trainer = AnticipationTrainer(model, use_mesh=True)
    T = 8
    rng = np.random.default_rng(0)
    visual = rng.standard_normal((8, T, 8)).astype(np.float32)
    motion = rng.standard_normal((8, T, 4)).astype(np.float32)
    targets = rng.integers(0, 3, (8, 5)).astype(np.int32)
    loss = trainer.train_step(visual, motion, targets)
    assert np.isfinite(loss)
    _assert_replicated(trainer.params)
    _roundtrip(trainer, tmp_path)


def test_captioning_mesh_step_and_ckpt(tmp_path):
    from video_mamba_suite_tpu.tasks.captioning.model import PDVC
    from video_mamba_suite_tpu.tasks.captioning.train import CaptioningTrainer

    B, T, C = 8, 32, 8
    model = PDVC(input_dim=C, num_classes=1, vocab_size=12, num_queries=4,
                 d_model=16, n_levels=2, num_encoder_layers=1,
                 num_decoder_layers=1, max_caption_len=4, impl="assoc")
    trainer = CaptioningTrainer(model, use_mesh=True)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    gt_boxes = np.tile(np.array([[0.5, 0.3]], np.float32), (B, 2, 1))
    gt_labels = np.zeros((B, 2), np.int32)
    gt_valid = np.ones((B, 2), bool)
    captions = np.tile(np.array([0, 3, 4, 0, -100], np.int64), (B, 2, 1))
    losses = trainer.train_step(feats, mask, gt_boxes, gt_labels, gt_valid,
                                captions)
    assert np.isfinite(losses["loss_total"])
    _assert_replicated(trainer.params)
    _roundtrip(trainer, tmp_path)


def test_recognition_mesh_step_and_ckpt(tmp_path):
    from video_mamba_suite_tpu.models.vivim import ViViM
    from video_mamba_suite_tpu.tasks.recognition.train import RecognitionTrainer

    model = ViViM(img_size=16, patch_size=8, num_frames=2, depth=1,
                  embed_dim=16, num_classes=4, impl="assoc")
    trainer = RecognitionTrainer(model, num_classes=4, mixup_alpha=0.0,
                                 cutmix_alpha=0.0, smoothing=0.0,
                                 use_mesh=True)
    rng = np.random.default_rng(0)
    videos = rng.standard_normal((8, 2, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, (8,)).astype(np.int32)
    loss = trainer.train_step(videos, labels)
    assert np.isfinite(loss)
    _assert_replicated(trainer.params)
    _roundtrip(trainer, tmp_path)


def test_egocentric_mesh_ckpt(tmp_path):
    from video_mamba_suite_tpu.models.clip import CLIP
    from video_mamba_suite_tpu.tasks.egocentric.train import ClipPretrainer

    model = CLIP(
        embed_dim=8, vision_tower="vivim",
        vision_cfg=dict(img_size=16, patch_size=8, num_frames=2, depth=1,
                        embed_dim=16, impl="assoc"),
        text_cfg=dict(context_length=6, vocab_size=50, width=16, heads=2,
                      layers=1),
    )
    trainer = ClipPretrainer(model, use_mesh=True)
    videos = jnp.zeros((8, 2, 16, 16, 3))
    texts = jnp.zeros((8, 6), jnp.int32)
    loss = trainer.train_step(videos, texts)
    assert np.isfinite(loss)
    _assert_replicated(trainer.params)
    _roundtrip(trainer, tmp_path)
