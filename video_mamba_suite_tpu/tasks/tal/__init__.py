"""Temporal Action Localization ("ActionMamba").

Capability match for /root/reference/video-mamba-suite/temporal-action-localization:
the ActionFormer-style single-stage detector with a Mamba pyramid backbone
(libs/modeling/backbones.py:241-327), FPN neck (necks.py), point generator
(loc_generators.py:28), focal+DIoU losses (losses.py), center-sampling label
assignment and decode (meta_archs.py:167-786), soft-NMS with segment voting
(libs/utils/nms.py + csrc/nms_cpu.cpp), and ANETdetection mAP (metrics.py).
"""

from .model import ActionMambaDetector, MambaBackbone, PointGenerator
from .losses import sigmoid_focal_loss, ctr_diou_loss_1d, ctr_giou_loss_1d
from .nms import batched_nms, nms_1d, soft_nms_1d
from .metrics import ANETdetection
from .train import TalTrainer

__all__ = [
    "ActionMambaDetector",
    "MambaBackbone",
    "PointGenerator",
    "sigmoid_focal_loss",
    "ctr_diou_loss_1d",
    "ctr_giou_loss_1d",
    "batched_nms",
    "nms_1d",
    "soft_nms_1d",
    "ANETdetection",
    "TalTrainer",
]
