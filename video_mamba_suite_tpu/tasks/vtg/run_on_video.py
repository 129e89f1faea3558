"""Run grounding on a raw video + free-text query — the reference's
`run_on_video/` demo pipeline (video-temporal-grounding/run_on_video/):
clip_feature_extractor.py samples frames at 1/clip_len fps through a frozen
CLIP image tower; data_utils.py's ClipFeatureExtractor.encode_text keeps the
per-token `last_hidden_state` as the query features (:43-48); the VTG model
then grounds the query.

Here: `VtgFeatureExtractor` wraps `ClipImageTower` + `TextTransformer`
(weights portable from published CLIP checkpoints via
`models/convert.py::convert_clip_image_tower` / `convert_text_transformer`);
`ground_video` builds a dataset-shaped sample and decodes ranked spans the
same way `VtgTrainer.predict` does (inference_mr.py:88-170).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...models.clip import ClipImageTower, TextTransformer
from .data import build_targets, collate_vtg


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class VtgFeatureExtractor:
    """CLIP frame + per-token query features (run_on_video/data_utils.py
    ClipFeatureExtractor equivalent; framerate = 1/clip_len)."""

    def __init__(self, image_params, text_params,
                 image_cfg: Optional[Dict[str, Any]] = None,
                 text_cfg: Optional[Dict[str, Any]] = None,
                 tokenizer=None, clip_len: float = 2.0):
        self.image_tower = ClipImageTower(**(image_cfg or {}))
        self.text_tower = TextTransformer(**(text_cfg or {}))
        self.image_params = image_params
        self.text_params = text_params
        self.clip_len = clip_len
        if tokenizer is None:
            from ...data.tokenizer import WordTokenizer

            tokenizer = WordTokenizer(
                context_length=self.text_tower.context_length)
        self.tokenizer = tokenizer
        self._img_fn = jax.jit(lambda p, x: self.image_tower.apply(p, x))
        self._txt_fn = jax.jit(lambda p, t: self.text_tower.apply(
            p, t, return_tokens=True))

    def video_features(self, video_path: str,
                       size: Optional[int] = None) -> np.ndarray:
        """Decode at 1/clip_len fps, resize+center-crop to the tower's
        img_size, CLIP-normalize, encode. Returns L2-normalized (T, D)."""
        from ...data.video import VideoDecoder

        size = size or self.image_tower.img_size
        dec = VideoDecoder(video_path)
        step = max(1, int(round(dec.fps * self.clip_len)))
        idx = list(range(0, dec.num_frames, step))
        frames = dec.get_batch(idx).astype(np.float32) / 255.0  # (T,H,W,3)
        t, h, w, _ = frames.shape
        scale = size / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        frames = jax.image.resize(jnp.asarray(frames), (t, nh, nw, 3),
                                  "bilinear")
        top, left = (nh - size) // 2, (nw - size) // 2
        frames = frames[:, top:top + size, left:left + size]
        frames = (frames - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        feats = self._img_fn(self.image_params, frames)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
        return np.asarray(feats, np.float32)

    def text_features(self, queries: Sequence[str]) -> list:
        """Per-token features trimmed to each query's valid length:
        List[(L_j, width)] fp32 (data_utils.py:43-48)."""
        toks = np.asarray(self.tokenizer(list(queries)))
        feats = np.asarray(self._txt_fn(self.text_params, jnp.asarray(toks)),
                           np.float32)
        out = []
        for j in range(len(queries)):
            valid = int((toks[j] != 0).sum())
            f = feats[j, :max(valid, 1)]
            out.append(f / np.maximum(
                np.linalg.norm(f, axis=-1, keepdims=True), 1e-8))
        return out


_VTG_APPLY_CACHE: Dict[int, Any] = {}


def _vtg_apply_fn(vtg_model):
    """Jitted model.apply cached per model instance: a fresh jit(lambda) on
    every ground_video call misses the jit cache and recompiles each time
    (minutes under the tunneled remote-compile service)."""
    key = id(vtg_model)
    fn = _VTG_APPLY_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, b: vtg_model.apply(
            p, b["src_txt"], b["src_txt_mask"],
            b["src_vid"], b["src_vid_mask"]))
        _VTG_APPLY_CACHE[key] = fn
    return fn


def ground_video(
    extractor: VtgFeatureExtractor,
    vtg_model,
    vtg_params,
    video_path: str,
    query: str,
    top_k: int = 5,
    use_tef: bool = True,
    max_q_l: int = 32,
    max_v_l: int = 75,
) -> Dict[str, Any]:
    """End-to-end: raw video + query → ranked [start_s, end_s, score] spans
    + per-clip saliency (the run.py demo contract; span decoding mirrors
    VtgTrainer.predict / inference_mr.py:88-170)."""
    vfeat = extractor.video_features(video_path)          # (T, D)
    T = len(vfeat)
    clip_len = extractor.clip_len
    duration = T * clip_len
    if use_tef:
        st = np.arange(T, dtype=np.float32) / T
        tef = np.stack([st, st + 1.0 / T], axis=1)
        vfeat = np.concatenate([vfeat, tef], axis=1)
    qfeat = extractor.text_features([query])[0]           # (Lt, D)
    sample = dict(
        qid=0, txt_feat=qfeat, vid_feat=vfeat,
        targets=build_targets(T, [[0.0, duration]], clip_len),
        relevant_windows=[[0.0, duration]], duration=duration,
        clip_len=clip_len,
    )
    batch = collate_vtg([sample], max_q_l, max_v_l)
    out = _vtg_apply_fn(vtg_model)(vtg_params, batch)
    spans = np.asarray(batch["timestamp"] + np.asarray(out["pred_spans"]))[0]
    prob = np.asarray(out["pred_logits"][..., 0])[0]
    lv = min(T, max_v_l)
    sp = np.clip(spans[:lv] * duration, 0, duration)
    order = np.argsort(-prob[:lv])[:top_k]
    windows = [[float(sp[k, 0]), float(sp[k, 1]), float(prob[k])]
               for k in order]
    saliency = np.asarray(out["saliency_scores"])[0][:lv].astype(np.float32)
    return {"query": query, "pred_relevant_windows": windows,
            "pred_saliency_scores": saliency.tolist()}
