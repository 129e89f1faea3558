"""Shared training infrastructure: config, optimizers, schedules, EMA,
checkpointing, meters — one implementation replacing the reference's four
per-suite idioms (SURVEY.md §5)."""

from .config import Config, load_config
from .optim import make_optimizer, no_weight_decay_mask
from .schedules import make_schedule
from .ema import EmaState, ema_init, ema_update
from .meters import AverageMeter
from .logging import MetricLogger
from .preemption import PreemptionWatcher
from .profiling import StepTimer, trace

__all__ = [
    "PreemptionWatcher",
    "Config",
    "load_config",
    "make_optimizer",
    "no_weight_decay_mask",
    "make_schedule",
    "EmaState",
    "ema_init",
    "ema_update",
    "AverageMeter",
    "MetricLogger",
    "StepTimer",
    "trace",
]
