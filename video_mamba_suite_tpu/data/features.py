"""Pre-extracted feature readers + threaded host→device prefetch.

Capability match for the reference's feature IO (TAL .pt per-video tensors,
TAS/VTG .npy arrays) plus the pipeline layer the reference lacks: a
background-threaded loader that overlaps host IO/collation with device
compute, double-buffering `jax.device_put` (SURVEY.md §2.4 TPU-native
equivalents: per-host data sharding feeding sharded batches).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import numpy as np


class FeatureReader:
    """Read (C, T) features from .npy / .npz / .pt files with optional
    memory-mapping and an LRU cache."""

    def __init__(self, root: str, ext: str = ".npy", mmap: bool = True,
                 cache_size: int = 0):
        self.root = root
        self.ext = ext
        self.mmap = mmap
        self._cache: dict = {}
        self.cache_size = cache_size

    def __call__(self, video_id: str) -> np.ndarray:
        if video_id in self._cache:
            return self._cache[video_id]
        path = os.path.join(self.root, video_id + self.ext)
        if self.ext == ".npy":
            arr = np.load(path, mmap_mode="r" if self.mmap else None)
        elif self.ext == ".npz":
            arr = np.load(path)["features"]
        elif self.ext == ".pt":
            from .pt_reader import is_zip_pt, load_pt

            if is_zip_pt(path):
                # torch-free zip-format reader (the only format modern
                # torch.save emits) — removes the serving path's last
                # torch dependency
                arr = np.asarray(load_pt(path))
            else:  # pre-1.6 legacy format: torch is the only reader
                import torch

                arr = torch.load(path, map_location="cpu").numpy()
        else:
            raise ValueError(f"unknown feature ext {self.ext!r}")
        if self.cache_size and len(self._cache) < self.cache_size:
            self._cache[video_id] = arr
        return arr


class PrefetchLoader:
    """Wrap a batch iterable: worker threads produce batches, main thread
    consumes device-resident arrays one step ahead."""

    def __init__(self, batch_fn: Callable[[int], Any], num_batches: int,
                 num_workers: int = 2, device_put: bool = True,
                 sharding=None):
        self.batch_fn = batch_fn
        self.num_batches = num_batches
        self.num_workers = max(1, num_workers)
        self.device_put = device_put
        self.sharding = sharding

    def _put(self, batch):
        if not self.device_put:
            return batch
        import jax

        if self.sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers + 1)
        indices = iter(range(self.num_batches))
        lock = threading.Lock()
        done = object()

        def worker():
            while True:
                with lock:
                    i = next(indices, None)
                if i is None:
                    q.put(done)
                    return
                q.put((i, self.batch_fn(i)))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        finished = 0
        received = 0
        buf = {}
        next_idx = 0
        while finished < self.num_workers and received < self.num_batches:
            item = q.get()
            if item is done:
                finished += 1
                continue
            i, batch = item
            buf[i] = batch
            while next_idx in buf:
                yield self._put(buf.pop(next_idx))
                next_idx += 1
                received += 1
        while next_idx in buf:
            yield self._put(buf.pop(next_idx))
            next_idx += 1
