"""Temporal Action Segmentation (ASFormer-Mamba).

Capability match for /root/reference/video-mamba-suite/temporal-action-segmentation:
MaTransformer (Mamba encoder + 3 attention decoders, model.py:358-373), the
CE + truncated-MSE smoothing loss (model.py:406-411), frame-acc / edit / F1
metrics (eval.py:35-90), and the feature/label batch pipeline (batch_gen.py).
"""

from .model import MaTransformer
from .train import TasTrainer, tas_loss
from .metrics import accuracy, edit_score, f_score, get_labels_start_end_time
from .data import TasBatchGenerator

__all__ = [
    "MaTransformer",
    "TasTrainer",
    "tas_loss",
    "accuracy",
    "edit_score",
    "f_score",
    "get_labels_start_end_time",
    "TasBatchGenerator",
]
