"""Action anticipation (TeSTra + causal Mamba, EK100).

Capability match for /root/reference/video-mamba-suite/action-anticipation:
the LSTR long/work-memory meta-arch with its transformer decoder replaced by
causal Mamba blocks (src/.../models/lstr.py:18-45, 281-301: MAMBA_LAYER
blocks over [long; work; anticipation-query] tokens, RMSNorm, classifier
(+verb/noun heads)), streaming inference via carried Mamba states
(LSTRStream.stream_inference :337-472), and per-frame / anticipation
recall metrics (evaluation/, utils/ek_utils.py).
"""

from .model import LSTRMamba
from .metrics import perframe_average_precision, topk_recall
from .train import AnticipationTrainer

__all__ = [
    "LSTRMamba",
    "perframe_average_precision",
    "topk_recall",
    "AnticipationTrainer",
]
