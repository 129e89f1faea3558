"""Egocentric understanding: CLIP-TimeMamba / ViViM pretraining + EK100 eval.

Capability match for /root/reference/video-mamba-suite/egocentric-understanding:
CLIP dual-encoder pretraining with global-batch contrastive loss
(avion/losses/losses.py:18-137), MaxMarginRankingLoss (:140-170), EK100
multi-instance retrieval mAP/nDCG (avion/utils/evaluation_ek100mir.py),
classification finetune, and the BPE tokenizer (avion/data/tokenizer.py).
"""

from .losses import clip_loss, max_margin_ranking_loss, sharded_clip_loss
from .metrics import calculate_mAP, calculate_nDCG, create_relevancy_matrix
from .train import ClipPretrainer

__all__ = [
    "clip_loss",
    "sharded_clip_loss",
    "max_margin_ranking_loss",
    "calculate_mAP",
    "calculate_nDCG",
    "create_relevancy_matrix",
    "ClipPretrainer",
]
