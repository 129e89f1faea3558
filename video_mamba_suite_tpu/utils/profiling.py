"""Profiling / step timing.

Replaces the reference's ad-hoc `torch.cuda.synchronize` wall-clock timing
and max_memory_allocated meters (SURVEY.md §5) with `jax.profiler` traces
and a block-until-ready step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Amortized step timing with device sync (train_utils.py:299-301
    equivalent, without the CUDA events)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self.total = 0.0
        self.count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def avg_ms(self) -> float:
        return 1e3 * self.total / max(self.count, 1)


def live_memory_bytes() -> Optional[int]:
    """Device HBM in use (max_memory_allocated analogue)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", 0)) if stats else None
    except Exception:
        return None
