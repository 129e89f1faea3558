"""RandAugment / RandomErasing video transforms (reference:
action-recognition/datasets/rand_augment.py + random_erasing.py)."""

import numpy as np
import pytest

from video_mamba_suite_tpu.data.video_augment import (
    RandAugmentVideo,
    RandomErasingVideo,
    auto_contrast,
    brightness,
    equalize,
    invert,
    posterize,
    rotate,
    solarize,
    solarize_add,
    train_augment_clip,
    translate_x_rel,
)


def _clip(T=2, H=16, W=16, C=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (T, H, W, C), dtype=np.uint8)


def test_invert_solarize_posterize_exact():
    c = _clip()
    assert np.array_equal(invert(c), 255 - c)
    # solarize at 256 is identity; at 0 is full inversion
    assert np.array_equal(solarize(c, 256), c)
    assert np.array_equal(solarize(c, 0), 255 - c)
    # posterize keeps top bits
    assert np.array_equal(posterize(c, 8), c)
    assert np.array_equal(posterize(c, 1), c & 0x80)
    assert np.array_equal(posterize(c, 0), np.zeros_like(c))


def test_solarize_add_only_below_threshold():
    c = np.array([[[[10, 200, 127]]]], np.uint8)
    out = solarize_add(c, 50)
    assert out[0, 0, 0, 0] == 60      # below 128: +50
    assert out[0, 0, 0, 1] == 200     # above: untouched
    assert out[0, 0, 0, 2] == 177     # 127 < 128: +50


def test_brightness_zero_blacks_out():
    c = _clip()
    assert np.array_equal(brightness(c, 0.0), np.zeros_like(c))
    assert np.array_equal(brightness(c, 1.0), c)


def test_autocontrast_stretches_range():
    c = np.full((1, 8, 8, 1), 100, np.uint8)
    c[0, 0, 0, 0] = 50
    c[0, -1, -1, 0] = 150
    out = auto_contrast(c)
    assert out.min() == 0 and out.max() == 255


def test_equalize_uniform_unchanged_shape():
    c = _clip()
    out = equalize(c)
    assert out.shape == c.shape and out.dtype == np.uint8


def test_rotate_zero_is_identity():
    c = _clip()
    np.testing.assert_array_equal(rotate(c, 0.0), c)


def test_rotate_90_matches_numpy_rot():
    # square frame, exact 90° rotation lands on the grid
    c = _clip(T=1, H=9, W=9)
    out = rotate(c, 90.0)
    # PIL rotate(90) = counter-clockwise = np.rot90 k=1 on (H, W);
    # ±1 from bilinear float roundoff on exact grid landings
    diff = out[0].astype(int) - np.rot90(c[0], k=1).astype(int)
    assert np.abs(diff).max() <= 1


def test_translate_fills_with_grey():
    c = _clip(T=1)
    out = translate_x_rel(c, 0.5)  # shift half the width
    assert np.all(out[0, :, -1] == 128)


def test_rand_augment_same_op_all_frames():
    # a clip with identical frames must stay frame-identical after aug
    frame = _clip(T=1)[0]
    clip = np.stack([frame] * 4)
    ra = RandAugmentVideo("rand-m7-n4-mstd0.5-inc1", seed=3)
    out = ra(clip)
    for t in range(1, 4):
        np.testing.assert_array_equal(out[t], out[0])


def test_rand_augment_deterministic_with_seed():
    c = _clip(T=3)
    a = RandAugmentVideo(seed=11)(c.copy())
    b = RandAugmentVideo(seed=11)(c.copy())
    np.testing.assert_array_equal(a, b)


def test_rand_augment_parses_config():
    ra = RandAugmentVideo("rand-m9-n2-mstd1.0-inc1")
    assert ra.magnitude == 9 and ra.num_layers == 2 and ra.mstd == 1.0


def test_random_erasing_erases_expected_area():
    rng = np.random.default_rng(0)
    re_ = RandomErasingVideo(probability=1.0, mode="const")
    clip = np.ones((4, 32, 32, 3), np.float32)
    out = re_(clip, rng)
    frac = float((out == 0).mean())
    assert 0.005 < frac < 0.5  # area ∈ [0.02, 1/3] per frame
    # frames erased independently: patterns differ across frames
    assert not np.array_equal(out[0], out[1]) or not np.array_equal(
        out[1], out[2])


def test_random_erasing_prob_zero_identity():
    clip = np.ones((2, 8, 8, 3), np.float32)
    out = RandomErasingVideo(probability=0.0)(clip)
    np.testing.assert_array_equal(out, clip)


def test_train_augment_clip_pipeline():
    c = _clip(T=2, H=16, W=16)
    out = train_augment_clip(
        c, rand_augment=RandAugmentVideo(seed=0),
        random_erasing=RandomErasingVideo(probability=1.0, seed=0),
        rng=np.random.default_rng(5))
    assert out.dtype == np.float32 and out.shape == c.shape
    # normalized: roughly zero-centred
    assert abs(float(out.mean())) < 3.0
