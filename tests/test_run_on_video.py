"""VTG run-on-video demo pipeline: CLIP image tower, per-token text
features, end-to-end grounding on a raw (npy-backend) video.

Reference: video-temporal-grounding/run_on_video/ — clip_feature_extractor
(frames at 1/clip_len fps → CLIP image features), data_utils
ClipFeatureExtractor.encode_text (per-token last_hidden_state), then the
VTG model grounds the query.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.models.clip import ClipImageTower, TextTransformer
from video_mamba_suite_tpu.tasks.vtg.model import UniVTGMamba
from video_mamba_suite_tpu.tasks.vtg.run_on_video import (
    VtgFeatureExtractor,
    ground_video,
)

IMG_CFG = dict(img_size=32, patch_size=16, width=24, layers=1, heads=4,
               output_dim=16)
TXT_CFG = dict(context_length=8, vocab_size=64, width=16, heads=4, layers=1,
               output_dim=16)


def _extractor():
    img = ClipImageTower(**IMG_CFG)
    txt = TextTransformer(**TXT_CFG)
    ip = img.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, 32, 32, 3)))
    tp = txt.init({"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, 8), jnp.int32))
    from video_mamba_suite_tpu.data.tokenizer import WordTokenizer

    tok = WordTokenizer(corpus=["a person opens the door"], context_length=8)
    return VtgFeatureExtractor(ip, tp, IMG_CFG, TXT_CFG, tokenizer=tok,
                               clip_len=2.0)


def test_clip_image_tower_shapes():
    tower = ClipImageTower(**IMG_CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 3))
    p = tower.init({"params": jax.random.PRNGKey(1)}, x)
    out = tower.apply(p, x)
    assert out.shape == (3, 16) and bool(jnp.all(jnp.isfinite(out)))


def test_text_tokens_output():
    txt = TextTransformer(**TXT_CFG)
    toks = jnp.zeros((2, 8), jnp.int32).at[:, :3].set(5)
    p = txt.init({"params": jax.random.PRNGKey(0)}, toks)
    tokens = txt.apply(p, toks, return_tokens=True)
    assert tokens.shape == (2, 8, 16)
    pooled = txt.apply(p, toks)
    assert pooled.shape == (2, 16)


def test_ground_video_end_to_end(tmp_path):
    # raw "video": npy frame stack (the decode backend every box has)
    frames = (np.random.default_rng(0).integers(
        0, 255, (90, 40, 48, 3))).astype(np.uint8)
    vid = tmp_path / "clip.npy"
    np.save(vid, frames)

    ex = _extractor()
    vfeat = ex.video_features(str(vid), size=32)
    # npy backend reports fps=30 → step 60 → ceil(90/60)=2 sampled clips
    assert vfeat.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(vfeat, axis=-1), 1.0,
                               rtol=1e-4)

    tfeat = ex.text_features(["a person opens the door"])[0]
    assert tfeat.ndim == 2 and tfeat.shape[1] == 16

    model = UniVTGMamba(txt_dim=16, vid_dim=16 + 2, embed_dim=32, depth=2,
                        impl="assoc")
    params = model.init(
        {"params": jax.random.PRNGKey(3)},
        jnp.zeros((1, 8, 16)), jnp.ones((1, 8)),
        jnp.zeros((1, 75, 18)), jnp.ones((1, 75)),
    )
    out = ground_video(ex, model, params, str(vid),
                       "a person opens the door", top_k=3, max_q_l=8)
    assert out["query"] == "a person opens the door"
    # only 2 sampled clips → 2 candidate spans despite top_k=3
    assert len(out["pred_relevant_windows"]) == 2
    for s0, s1, sc in out["pred_relevant_windows"]:
        assert math.isfinite(sc)
    assert len(out["pred_saliency_scores"]) == 2  # one per sampled clip


def test_convert_clip_image_tower():
    torch = pytest.importorskip("torch")
    from video_mamba_suite_tpu.models.convert import convert_clip_image_tower

    g = torch.Generator().manual_seed(0)
    d, heads, p, n = 24, 4, 16, 4

    def _r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "visual.conv1.weight": _r(d, 3, p, p),
        "visual.class_embedding": _r(d),
        "visual.positional_embedding": _r(n + 1, d),
        "visual.ln_pre.weight": torch.ones(d),
        "visual.ln_pre.bias": torch.zeros(d),
        "visual.ln_post.weight": torch.ones(d),
        "visual.ln_post.bias": torch.zeros(d),
        "visual.proj": _r(d, 16),
        "visual.transformer.resblocks.0.ln_1.weight": torch.ones(d),
        "visual.transformer.resblocks.0.ln_1.bias": torch.zeros(d),
        "visual.transformer.resblocks.0.ln_2.weight": torch.ones(d),
        "visual.transformer.resblocks.0.ln_2.bias": torch.zeros(d),
        "visual.transformer.resblocks.0.attn.in_proj_weight": _r(3 * d, d),
        "visual.transformer.resblocks.0.attn.in_proj_bias": _r(3 * d),
        "visual.transformer.resblocks.0.attn.out_proj.weight": _r(d, d),
        "visual.transformer.resblocks.0.attn.out_proj.bias": _r(d),
        "visual.transformer.resblocks.0.mlp.c_fc.weight": _r(4 * d, d),
        "visual.transformer.resblocks.0.mlp.c_fc.bias": _r(4 * d),
        "visual.transformer.resblocks.0.mlp.c_proj.weight": _r(d, 4 * d),
        "visual.transformer.resblocks.0.mlp.c_proj.bias": _r(d),
    }
    tower = ClipImageTower(img_size=32, patch_size=16, width=d, layers=1,
                           heads=heads, output_dim=16)
    init = tower.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, 32, 32, 3)))
    conv = {"params": jax.tree_util.tree_map(
        jnp.asarray, convert_clip_image_tower(sd, layers=1, num_heads=heads))}
    assert (jax.tree_util.tree_map(lambda a: a.shape, init["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, conv["params"]))
    out = tower.apply(conv, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 16) and bool(jnp.all(jnp.isfinite(out)))
