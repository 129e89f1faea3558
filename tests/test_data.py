"""Data layer: tokenizers, frame sampling, preprocessing, prefetch loader."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_mamba_suite_tpu.data import (
    FeatureReader,
    PrefetchLoader,
    WordTokenizer,
    preprocess_clip,
    sample_frame_indices,
)
from video_mamba_suite_tpu.data.tokenizer import SimpleTokenizer, tokenize
from video_mamba_suite_tpu.data.video import synthetic_video


def test_word_tokenizer_roundtrip():
    corpus = ["a man is cooking", "a dog runs"]
    tok = WordTokenizer(corpus, context_length=10)
    ids = tok(["a man is cooking"])
    assert ids.shape == (1, 10)
    assert ids[0, 0] == tok.BOS
    # 4 words + BOS + EOS
    assert (ids[0] != 0).sum() == 6
    # unknown words map to UNK
    ids2 = tok(["zebra"])
    assert ids2[0, 1] == tok.UNK


def test_simple_tokenizer_with_tiny_bpe(tmp_path):
    """Build a minimal merges file and check BPE merge behavior."""
    merges = "#version\nh e\nhe l\nhel l\nhell o</w>\n"
    p = tmp_path / "bpe.txt"
    p.write_text(merges)
    tok = SimpleTokenizer(str(p), context_length=8)
    ids = tok(["hello"])
    assert ids.shape == (1, 8)
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    assert ids[0, 0] == sot
    assert eot in ids[0]
    # 'hello' should merge to a single token ('hello</w>')
    n_tokens = int((ids[0] != 0).sum())
    assert n_tokens == 3  # sot + hello + eot


def test_sample_frame_indices():
    idx = sample_frame_indices(8, 100, mode="uniform")
    assert len(idx) == 8 and idx[0] == 0 and idx[-1] == 99
    idx_sparse = sample_frame_indices(8, 100, mode="sparse")
    assert (np.diff(idx_sparse) > 0).all()
    rng = np.random.default_rng(0)
    idx_rand = sample_frame_indices(8, 100, mode="sparse", rng=rng)
    assert (idx_rand < 100).all() and (idx_rand >= 0).all()
    # short videos: indices stay valid
    idx_short = sample_frame_indices(8, 3, mode="sparse")
    assert (idx_short < 3).all()


def test_preprocess_clip_shapes_and_normalization():
    video = synthetic_video(num_frames=4, size=64)
    out = preprocess_clip(jnp.asarray(video), size=32, train=False)
    assert out.shape == (4, 32, 32, 3)
    # normalized: roughly zero-centered
    assert abs(float(jnp.mean(out))) < 2.0
    out_train = preprocess_clip(
        jnp.asarray(video), jax.random.PRNGKey(0), size=32, train=True
    )
    assert out_train.shape == (4, 32, 32, 3)


def test_feature_reader_and_prefetch(tmp_path):
    for i in range(4):
        np.save(tmp_path / f"v{i}.npy", np.full((3, 5), i, np.float32))
    reader = FeatureReader(str(tmp_path))
    assert reader("v2")[0, 0] == 2.0

    batches = list(PrefetchLoader(
        lambda i: {"x": np.full((2,), i, np.float32)}, num_batches=5,
        num_workers=3, device_put=False,
    ))
    assert len(batches) == 5
    # order preserved
    assert [int(b["x"][0]) for b in batches] == [0, 1, 2, 3, 4]


def test_sharded_sampler_covers_and_disjoint():
    """DistributedSampler semantics: same length per shard, union covers,
    epoch reshuffles identically across shards."""
    from video_mamba_suite_tpu.data.sampler import ShardedSampler

    n, shards = 13, 4
    samplers = [ShardedSampler(n, shards, i, seed=7) for i in range(shards)]
    for s in samplers:
        s.set_epoch(0)
    idx = [list(s) for s in samplers]
    assert all(len(i) == 4 for i in idx)  # ceil(13/4) each (padded)
    flat = [j for i in idx for j in i]
    assert set(flat) == set(range(n))     # union covers despite padding
    # determinism + epoch reshuffle
    s2 = ShardedSampler(n, shards, 1, seed=7)
    s2.set_epoch(0)
    assert list(s2) == idx[1]
    s2.set_epoch(1)
    assert list(s2) != idx[1]
    # drop_last truncates evenly
    d = ShardedSampler(n, shards, 0, seed=7, drop_last=True)
    assert len(d) == 3 and len(list(d)) == 3
    # no-shuffle is the identity order dealt out strided
    ns = ShardedSampler(6, 2, 0, shuffle=False)
    assert list(ns) == [0, 2, 4]
