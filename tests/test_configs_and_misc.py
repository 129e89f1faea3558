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


def test_rope_rotate_properties():
    from video_mamba_suite_tpu.models.rope import rope_rotate

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    out = rope_rotate(x)
    assert out.shape == x.shape
    # rotation preserves the norm of each (x1, x2) pair
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
    )
    # position 0 is identity (angle 0)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]),
                               rtol=1e-5)


def test_fuse_external_scores():
    from video_mamba_suite_tpu.tasks.tal.train import fuse_external_scores

    segs = np.array([[0.0, 10.0], [20.0, 30.0]])
    scores = np.array([0.9, 0.4])
    ext = np.array([0.05, 0.8, 0.15])  # class 1 dominant
    s, sc, lb = fuse_external_scores(segs, scores, ext, topk_per_prop=2)
    assert len(s) == 4  # 2 proposals × top-2 classes
    assert lb[0] == 1   # best = strongest proposal × strongest class
    np.testing.assert_allclose(sc[0], np.sqrt(0.9 * 0.8), rtol=1e-6)


def test_vtg_rope_option_runs():
    from video_mamba_suite_tpu.tasks.vtg import UniVTGMamba

    model = UniVTGMamba(txt_dim=8, vid_dim=8, embed_dim=16, depth=2,
                        if_rope=True, impl="assoc")
    txt = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    vid = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8))
    tm, vm = jnp.ones((1, 4)), jnp.ones((1, 8))
    params = model.init({"params": jax.random.PRNGKey(2)}, txt, tm, vid, vm)
    out = model.apply(params, txt, tm, vid, vm)
    assert bool(jnp.all(jnp.isfinite(out["pred_spans"])))
