"""Preemption-safe checkpointing for long TPU jobs.

TPU VMs (and SLURM jobs, the reference's launcher) deliver SIGTERM ahead
of preemption/requeue; the reference's whole recovery story is
`--kill-on-bad-exit` + resume-from-last-epoch (SURVEY.md §5 "Failure
detection"). This goes one step further: a signal watcher that any task
trainer's epoch/step loop can poll so an in-flight run checkpoints the
CURRENT step on preemption instead of losing the epoch.

Usage (every task trainer exposes save/restore via TrainerCore):

    watcher = PreemptionWatcher()            # installs SIGTERM handler
    for step, batch in enumerate(loader):
        state = trainer.train_step(batch)
        if watcher.save_if_needed(trainer.core, ckpt_dir, step,
                                  trainer.state_dict(), every=save_every):
            break                            # preempted: saved, exit clean

Restore on the next run goes through the normal `TrainerCore.restore`
latest-step path — no special resume logic needed.
"""

from __future__ import annotations

import signal
import threading
from typing import Any, Iterable, Optional


class PreemptionWatcher:
    """Latches termination signals; thread-safe, re-entrant safe.

    Installs handlers for `signals` (default SIGTERM — what TPU-VM
    maintenance events and SLURM send) that set a flag instead of killing
    the process; the previous handlers are chained so external behavior
    (e.g. pytest's own SIGINT handling) is preserved after `close()`.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._flag = threading.Event()
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass

    def _handler(self, signum, frame):
        self._flag.set()

    @property
    def preempted(self) -> bool:
        return self._flag.is_set()

    def save_if_needed(self, core: Any, directory: str, step: int,
                       state: Any, every: Optional[int] = None) -> bool:
        """Save on the periodic schedule OR on a latched preemption.

        Returns True when preempted (the checkpoint for the current step
        is already written synchronously — orbax save_checkpoint blocks
        until finished — so the caller can exit immediately).
        """
        periodic = every is not None and every > 0 and step % every == 0
        if self.preempted or periodic:
            core.save(directory, step, state)
        return self.preempted

    def close(self) -> None:
        """Restore the previous signal handlers."""
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev.clear()

    def __enter__(self) -> "PreemptionWatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
