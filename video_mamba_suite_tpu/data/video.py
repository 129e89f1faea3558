"""Raw-video decode + preprocessing pipeline.

Capability match for the AVION raw-video path (/root/reference/
video-mamba-suite/egocentric-understanding/avion/data/clip_dataset.py:21-135:
decord decode with fused resize/crop via --fused-decode-crop N9, frame
sampling, retry-on-error) and action-recognition's sparse sampling
(datasets/kinetics_sparse.py:28-102).

TPU design (BASELINE north star): the host decodes compressed frames (any of
decord / PyAV / OpenCV / ffmpeg-pipe, auto-detected; OpenCV is available in
this image), while resize / crop / flip / normalization run as one jitted
jnp stage on device — the XLA equivalent of AVION's fused decode-crop +
GPU kornia transforms (engine/main_lavila_finetune_cls.py:281-307).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _detect_backend() -> Optional[str]:
    for name in ("decord", "av", "cv2"):
        try:
            __import__(name)
            return name
        except ImportError:
            continue
    import shutil

    if shutil.which("ffmpeg"):
        return "ffmpeg"
    return None


class VideoDecoder:
    """Backend-autodetecting video reader: frames(indices) → uint8 array.

    clip_dataset.py `get_video_reader`/`video_loader` equivalent; the decord
    fused width/height resize is forwarded when supported.
    """

    def __init__(self, path: str, backend: Optional[str] = None,
                 width: int = -1, height: int = -1):
        self.path = path
        if backend is None and path.endswith(".npy"):
            backend = "npy"  # pre-extracted (T, H, W, 3) uint8 frame arrays
        self.backend = backend or _detect_backend()
        self.width, self.height = width, height
        if self.backend is None:
            raise RuntimeError(
                "no video decode backend available (decord/av/cv2/ffmpeg); "
                "install one or use precomputed features"
            )
        self._open()

    def _open(self):
        if self.backend == "npy":
            self._frames = np.load(self.path, mmap_mode="r")
            self.num_frames = self._frames.shape[0]
            self.fps = 30.0
        elif self.backend == "decord":
            import decord

            kw = {}
            if self.width > 0:
                kw = dict(width=self.width, height=self.height)
            self._vr = decord.VideoReader(self.path, num_threads=1, **kw)
            self.num_frames = len(self._vr)
            self.fps = float(self._vr.get_avg_fps())
        elif self.backend == "av":
            import av

            self._container = av.open(self.path)
            stream = self._container.streams.video[0]
            self.num_frames = stream.frames
            self.fps = float(stream.average_rate)
        elif self.backend == "cv2":
            import cv2

            self._cap = cv2.VideoCapture(self.path)
            if not self._cap.isOpened():
                raise RuntimeError(f"cv2 could not open {self.path!r}")
            self.num_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self.fps = float(self._cap.get(cv2.CAP_PROP_FPS))
        elif self.backend == "ffmpeg":
            raise NotImplementedError(
                "ffmpeg-pipe backend requires the ffmpeg binary at runtime"
            )

    def get_batch(self, indices: Sequence[int]) -> np.ndarray:
        """(N, H, W, 3) uint8 frames at the given indices."""
        if self.backend == "npy":
            return np.asarray(self._frames[np.asarray(indices, int)])
        if self.backend == "decord":
            return self._vr.get_batch(list(indices)).asnumpy()
        if self.backend == "av":
            wanted = set(int(i) for i in indices)
            frames = {}
            self._container.seek(0)
            for i, frame in enumerate(self._container.decode(video=0)):
                if i in wanted:
                    frames[i] = frame.to_ndarray(format="rgb24")
                if len(frames) == len(wanted):
                    break
            return np.stack([frames[int(i)] for i in indices])
        if self.backend == "cv2":
            import cv2

            out = []
            for i in indices:
                self._cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
                ok, frame = self._cap.read()
                if not ok:
                    frame = out[-1] if out else np.zeros((224, 224, 3), np.uint8)
                out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            return np.stack(out)
        raise RuntimeError(self.backend)


def sample_frame_indices(num_frames: int, total: int, mode: str = "sparse",
                         clip_idx: int = 0, num_clips: int = 1,
                         rng: Optional[np.random.Generator] = None
                         ) -> np.ndarray:
    """Frame samplers.

    'sparse': segment-uniform sampling (kinetics_sparse.py:28-102) — split the
    video into num_frames segments, sample one frame per segment (random in
    training via rng, deterministic per clip_idx for multi-view test).
    'uniform': evenly spaced (EgoSchema 16f-uniform eval).
    """
    total = max(total, 1)
    if mode == "uniform":
        return np.linspace(0, total - 1, num_frames).round().astype(np.int64)
    seg = np.linspace(0, total, num_frames + 1)
    idx = []
    for i in range(num_frames):
        lo, hi = int(seg[i]), max(int(seg[i + 1]) - 1, int(seg[i]))
        if rng is not None:
            idx.append(int(rng.integers(lo, hi + 1)))
        else:
            frac = (clip_idx + 0.5) / max(num_clips, 1)
            idx.append(int(round(lo + (hi - lo) * frac)))
    return np.asarray(idx, np.int64)


def _preprocess_clip_impl(frames, rng, size: int, train: bool,
                          mean: Tuple[float, ...], std: Tuple[float, ...]):
    import jax
    import jax.numpy as jnp

    x = frames.astype(jnp.float32) / 255.0
    T, H, W, C = x.shape
    scale = size * 1.15 if train else size * 256 // 224
    new_h = int(round(H * float(scale) / min(H, W)))
    new_w = int(round(W * float(scale) / min(H, W)))
    x = jax.image.resize(x, (T, new_h, new_w, C), "bilinear")
    if train:
        k1, k2, k3 = jax.random.split(rng, 3)
        top = jax.random.randint(k1, (), 0, new_h - size + 1)
        left = jax.random.randint(k2, (), 0, new_w - size + 1)
        x = jax.lax.dynamic_slice(x, (0, top, left, 0), (T, size, size, C))
        flip = jax.random.bernoulli(k3)
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    else:
        top = (new_h - size) // 2
        left = (new_w - size) // 2
        x = x[:, top : top + size, left : left + size, :]
    mean_a = jnp.asarray(mean)
    std_a = jnp.asarray(std)
    return (x - mean_a) / std_a


@functools.lru_cache(maxsize=8)
def _jitted_preprocess(size: int, train: bool, mean, std):
    import jax

    return jax.jit(
        lambda frames, rng: _preprocess_clip_impl(frames, rng, size, train,
                                                  mean, std)
    )


def preprocess_clip(frames, rng=None, size: int = 224, train: bool = False,
                    mean: Tuple[float, ...] = CLIP_MEAN,
                    std: Tuple[float, ...] = CLIP_STD):
    """Fused on-device transform: uint8 (T, H, W, 3) → float (T, size, size, 3).

    resize (bilinear) → [random|center] crop → [random hflip] → normalize,
    one XLA program — the AVION fused decode-crop + kornia-GPU equivalent
    (clip_dataset.py:30-52 + main_lavila_finetune_cls.py:281-307).
    """
    import jax

    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _jitted_preprocess(size, train, tuple(mean), tuple(std))(frames, rng)


def synthetic_video(num_frames: int = 16, size: int = 224, seed: int = 0
                    ) -> np.ndarray:
    """Deterministic uint8 test video (moving gradient)."""
    rng = np.random.default_rng(seed)
    t = np.arange(num_frames)[:, None, None, None]
    y = np.arange(size)[None, :, None, None]
    x = np.arange(size)[None, None, :, None]
    base = (x + y + 8 * t) % 256
    noise = rng.integers(0, 16, (num_frames, size, size, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)
