"""Action recognition (ViViM on Kinetics-400).

Capability match for /root/reference/video-mamba-suite/action-recognition:
run_class_finetuning.py + engines/engine_for_finetuning.py — mixup/cutmix,
soft-target CE, layer-decay AdamW, EMA, multi-view (temporal × spatial crop)
test-time merging and top-1/top-5 accuracy; datasets/kinetics_sparse.py
sparse frame sampling.
"""

from .train import RecognitionTrainer, soft_target_cross_entropy
from .augment import mixup_cutmix, one_hot_smooth
from .engine import merge_multi_view, topk_accuracy
from .optim import layer_decay_param_groups

__all__ = [
    "RecognitionTrainer",
    "soft_target_cross_entropy",
    "mixup_cutmix",
    "one_hot_smooth",
    "merge_multi_view",
    "topk_accuracy",
    "layer_decay_param_groups",
]
