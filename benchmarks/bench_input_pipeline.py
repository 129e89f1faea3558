"""Raw-video input-pipeline line-rate benchmark (SURVEY.md §7 hard part d).

The reference's raw-video suites bottleneck on host decode (AVION patched
decord, N9); the equivalent here is `data.video.VideoDecoder` + the jitted
device preprocess + `data.features.PrefetchLoader` overlap. This measures:

  1. raw decode+sample rate (clips/s) for 1..W worker threads;
  2. the full pipeline (decode → jitted resize/crop/normalize → device_put)
     through PrefetchLoader, i.e. what a trainer sees;
  3. the ratio vs the model consumption rate (TimeMamba-B ≈ 78 clips/s/chip
     fwd), the "input pipeline at line rate" criterion.

Writes K synthetic videos first (cv2 VideoWriter). Per-core rates are the
portable number — this box has ONE core; production hosts scale ≈ linearly
with cores since decode is embarrassingly parallel per clip.

Usage: python benchmarks/bench_input_pipeline.py [--videos 8] [--workers 1,2,4]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_videos(root: str, k: int, frames: int = 64, size: int = 256,
                fps: int = 30):
    import cv2

    paths = []
    rng = np.random.default_rng(0)
    for i in range(k):
        path = os.path.join(root, f"clip{i}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (size, size))
        base = rng.integers(0, 255, (size, size, 3), np.uint8)
        for t in range(frames):
            frame = np.roll(base, t * 3, axis=1)  # compressible but nontrivial
            w.write(frame)
        w.release()
        paths.append(path)
    return paths


def decode_clip(path: str, num_frames: int = 16) -> np.ndarray:
    from video_mamba_suite_tpu.data.video import (
        VideoDecoder,
        sample_frame_indices,
    )

    dec = VideoDecoder(path)
    idx = sample_frame_indices(num_frames, dec.num_frames, mode="sparse")
    return dec.get_batch(idx)  # (T, H, W, 3) uint8


def bench_decode(paths, workers: int, iters: int = 24, num_frames: int = 16):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(workers) as ex:
        t0 = time.perf_counter()
        done = list(ex.map(
            lambda i: decode_clip(paths[i % len(paths)], num_frames),
            range(iters)))
        dt = time.perf_counter() - t0
    assert all(d.shape[0] == num_frames for d in done)
    return iters / dt


def bench_pipeline(paths, workers: int, batch: int = 8, batches: int = 8,
                   num_frames: int = 16, size: int = 224):
    import jax

    from concurrent.futures import ThreadPoolExecutor

    from video_mamba_suite_tpu.data.features import PrefetchLoader
    from video_mamba_suite_tpu.data.video import preprocess_clip

    ex = ThreadPoolExecutor(workers)

    def batch_fn(i):
        clips = list(ex.map(
            lambda j: decode_clip(paths[(i * batch + j) % len(paths)],
                                  num_frames),
            range(batch)))
        import jax.numpy as jnp

        # per-clip fused device transform (rank-4 contract), stacked on device
        return jnp.stack([preprocess_clip(c, size=size, train=False)
                          for c in clips])

    loader = PrefetchLoader(batch_fn, num_batches=batches)
    # warmup one batch (jit compile of the preprocess)
    next(iter(PrefetchLoader(batch_fn, num_batches=1)))
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        jax.block_until_ready(b)
        n += b.shape[0]
    dt = time.perf_counter() - t0
    ex.shutdown()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--workers", type=str, default="1,2,4")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        paths = make_videos(root, args.videos)
        for w in map(int, args.workers.split(",")):
            r = bench_decode(paths, w, num_frames=args.frames)
            print(f"[decode] workers={w}: {r:6.1f} clips/s", flush=True)
        for w in map(int, args.workers.split(",")):
            r = bench_pipeline(paths, w, num_frames=args.frames)
            print(f"[pipeline] workers={w}: {r:6.1f} clips/s "
                  f"(vs TimeMamba-B fwd ~78 clips/s/chip)", flush=True)


if __name__ == "__main__":
    main()
