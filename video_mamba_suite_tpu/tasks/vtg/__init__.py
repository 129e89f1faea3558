"""Video Temporal Grounding + Highlight Detection (UniVTG-Mamba).

Capability match for /root/reference/video-mamba-suite/video-temporal-grounding:
the UniVTG model with a Mamba encoder over the concatenated [txt; vid] token
sequence (model/univtg_mamba.py:191-387), the SetCriterion span/label/saliency
losses (:388-583), the MR dataset target construction (main/dataset.py:175-236)
and the mAP/R1/HD evaluation (eval/eval.py).
"""

from .model import UniVTGMamba
from .losses import vtg_losses
from .data import build_targets, make_synthetic_vtg
from .metrics import compute_mr_ap, compute_mr_r1, compute_hl_hit1, compute_hl_ap
from .train import VtgTrainer

__all__ = [
    "UniVTGMamba",
    "vtg_losses",
    "build_targets",
    "make_synthetic_vtg",
    "compute_mr_ap",
    "compute_mr_r1",
    "compute_hl_hit1",
    "compute_hl_ap",
    "VtgTrainer",
]
