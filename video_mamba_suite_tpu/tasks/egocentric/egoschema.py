"""EgoSchema zero-shot QA via CLIP similarity.

Reference: /root/reference/video-mamba-suite/egocentric-understanding/
engine/main_lavila_pretrain.py:599-671 — encode the clip (uniform 16-frame
sampling), encode each of the 5 answer options as text, pick the option with
the highest cosine similarity; accuracy over questions.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def egoschema_zero_shot(
    encode_video: Callable[[np.ndarray], np.ndarray],
    encode_text: Callable[[np.ndarray], np.ndarray],
    questions: Sequence[Dict],
    tokenizer,
) -> Dict[str, float]:
    """questions: [{video: (T, H, W, 3) array, options: [str × 5],
    answer: int}] → {'accuracy': %}."""
    correct = 0
    for q in questions:
        v = encode_video(q["video"][None])          # (1, D)
        v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
        tokens = tokenizer(list(q["options"]))
        t = encode_text(tokens)                     # (5, D)
        t = t / np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
        pred = int(np.argmax(v @ t.T))
        correct += int(pred == int(q["answer"]))
    return {"accuracy": 100.0 * correct / max(len(questions), 1)}
