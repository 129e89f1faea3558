"""Dense video captioning (PDVC-Mamba).

Capability match for /root/reference/video-mamba-suite/video-dense-captioning:
the PDVC query-based detect+caption meta-arch (pdvc/pdvc.py:34-490) with a
Mamba encoder replacing the deformable-attention encoder
(pdvc/deformable_transformer.py:233-279), 1-D multi-scale deformable
cross-attention in the decoder (pdvc/ops/), LSTM captioning head
(pdvc/CaptioningHead/LSTM.py), Hungarian matcher + SetCriterion
(pdvc/matcher.py, criterion.py), and densevid_eval metrics
(eval_dvc.py, eval_soda.py).
"""

from .model import PDVC, DeformableTransformer
from .matcher import hungarian_match
from .criterion import pdvc_losses
from .metrics import (
    bleu4,
    cider_d,
    rouge_l,
    evaluate_dvc,
    evaluate_para,
    rerank_predictions,
    soda_c,
)
from .scorers import (
    bleu_corpus,
    cider_corpus,
    meteor_corpus,
    ptb_tokenize,
    rouge_l_corpus,
)
from .train import CaptioningTrainer

__all__ = [
    "PDVC",
    "DeformableTransformer",
    "hungarian_match",
    "pdvc_losses",
    "bleu4",
    "bleu_corpus",
    "cider_corpus",
    "cider_d",
    "meteor_corpus",
    "ptb_tokenize",
    "rouge_l",
    "rouge_l_corpus",
    "evaluate_dvc",
    "evaluate_para",
    "rerank_predictions",
    "soda_c",
    "CaptioningTrainer",
]
