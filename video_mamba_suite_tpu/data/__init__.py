"""Data layer: tokenizer, video decode pipeline, feature readers, prefetch.

Capability match for the reference's input stacks: the CLIP BPE tokenizer
(egocentric avion/data/tokenizer.py), the AVION raw-video decode+transform
path (avion/data/clip_dataset.py + third_party/decord N9), sparse frame
sampling (action-recognition datasets/kinetics_sparse.py), per-video feature
files (TAL/TAS/VTG loaders), and host→device prefetch.
"""

from .tokenizer import SimpleTokenizer, WordTokenizer, tokenize
from .video import (
    VideoDecoder,
    sample_frame_indices,
    preprocess_clip,
    CLIP_MEAN,
    CLIP_STD,
)
from .features import FeatureReader, PrefetchLoader
from .sampler import ShardedSampler

__all__ = [
    "SimpleTokenizer",
    "WordTokenizer",
    "tokenize",
    "VideoDecoder",
    "sample_frame_indices",
    "preprocess_clip",
    "CLIP_MEAN",
    "CLIP_STD",
    "FeatureReader",
    "PrefetchLoader",
    "ShardedSampler",
]
