"""Config system, presets, EgoSchema QA path, generation extras."""

import jax
import jax.numpy as jnp
import numpy as np

from video_mamba_suite_tpu.configs import PRESETS, get_preset
from video_mamba_suite_tpu.utils.config import Config
from video_mamba_suite_tpu.utils.schedules import ReduceLROnPlateau


def test_config_merge_and_override():
    base = Config(dict(a=1, b=dict(c=2, d=3)))
    merged = base.merged(dict(b=dict(c=9), e=5))
    assert merged.a == 1 and merged.b.c == 9 and merged.b.d == 3
    assert merged.e == 5
    over = base.override({"b.c": 42, "x.y": 1})
    assert over.b.c == 42 and over.x.y == 1
    # round-trip through dict
    assert Config(merged.to_dict()).b.c == 9


def test_presets_complete():
    names = {"tal_thumos", "tas_gtea", "vtg_qvhighlights", "dvc_anet_c3d",
             "anticipation_ek100", "ego_timemamba_pretrain",
             "recognition_k400_vivim_tiny"}
    assert names <= set(PRESETS)
    cfg = get_preset("tal_thumos")
    assert cfg.model.mixer == "dbm"
    assert cfg.dataset.max_seq_len == 2304


def test_plateau_scheduler():
    s = ReduceLROnPlateau(factor=0.5, patience=1)
    assert s.step(1.0) == 1.0
    assert s.step(0.5) == 1.0      # improved
    assert s.step(0.6) == 1.0      # 1 bad epoch (patience)
    assert s.step(0.7) == 0.5      # 2 bad epochs → decay


def test_egoschema_zero_shot():
    from video_mamba_suite_tpu.data import WordTokenizer
    from video_mamba_suite_tpu.tasks.egocentric.egoschema import (
        egoschema_zero_shot,
    )

    tok = WordTokenizer(["red video", "blue video"], context_length=6)

    # fake encoders: video feature = mean color; text "red"→[1,0], "blue"→[0,1]
    def encode_video(v):
        m = v.reshape(v.shape[0], -1, 3).mean(1)
        return np.stack([m[:, 0], m[:, 2]], axis=1)

    red_id = tok.word_to_id["red"]

    def encode_text(tokens):
        has_red = (tokens == red_id).any(axis=1)
        return np.stack([has_red, ~has_red], axis=1).astype(np.float64)

    red_clip = np.zeros((2, 4, 4, 3)); red_clip[..., 0] = 1.0
    blue_clip = np.zeros((2, 4, 4, 3)); blue_clip[..., 2] = 1.0
    qs = [
        dict(video=red_clip, options=["red video", "blue video"], answer=0),
        dict(video=blue_clip, options=["red video", "blue video"], answer=1),
    ]
    res = egoschema_zero_shot(encode_video, encode_text, qs, tok)
    assert res["accuracy"] == 100.0


def test_tal_checkpoint_resume(tmp_path):
    """Orbax save → restore reproduces the exact training state."""
    import numpy as np

    from video_mamba_suite_tpu.tasks.tal import TalTrainer
    from video_mamba_suite_tpu.tasks.tal.data import (
        collate_tal,
        make_synthetic_tal,
    )

    items = make_synthetic_tal(num_videos=2, num_classes=2, feat_dim=8,
                               seq_len=64)
    tr = TalTrainer(input_dim=8, num_classes=2, max_seq_len=64, embd_dim=16,
                    backbone_arch=(1, 1, 1),
                    regression_range=[(0, 16), (16, 10000)],
                    impl="assoc", max_num_gt=4)
    batch = collate_tal(items, 64, 4, training=True)
    tr.train_step(*batch)
    tr.save(str(tmp_path / "ckpt"), step=1)

    tr2 = TalTrainer(input_dim=8, num_classes=2, max_seq_len=64, embd_dim=16,
                     backbone_arch=(1, 1, 1),
                     regression_range=[(0, 16), (16, 10000)],
                     impl="assoc", max_num_gt=4)
    step = tr2.restore(str(tmp_path / "ckpt"), batch[0], batch[1])
    assert step == 1
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        assert jnp.array_equal(a, b)
    assert float(tr2.loss_norm) == float(tr.loss_norm)
