"""Structured metric logging.

Replaces the reference's TensorBoard SummaryWriters + plain-text loggers
(SURVEY.md §5): JSONL metric streams (machine-readable, append-only) plus an
stdout pretty-printer. TensorBoard is emitted too when the package exists.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "train",
                 stdout: bool = True):
        self.stdout = stdout
        self._fh = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, f"{name}.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        rec.update({f"{prefix}{k}": _to_py(v) for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._tb:
            for k, v in metrics.items():
                if isinstance(_to_py(v), (int, float)):
                    self._tb.add_scalar(prefix + k, _to_py(v), step)
        if self.stdout:
            parts = " ".join(
                f"{k}={_fmt(v)}" for k, v in metrics.items()
            )
            print(f"[{prefix or 'step'} {step}] {parts}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def _fmt(v):
    v = _to_py(v)
    return f"{v:.4f}" if isinstance(v, float) else str(v)
