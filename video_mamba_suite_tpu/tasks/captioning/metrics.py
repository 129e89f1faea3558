"""Dense-captioning evaluation: caption scorers + dvc/SODA harnesses.

Reference: /root/reference/video-mamba-suite/video-dense-captioning/
densevid_eval3/ (the 2018/2021 ActivityNet scorers) + eval_soda.py. Numpy
implementations of BLEU-4, ROUGE-L and CIDEr-D; METEOR is replaced by a
exact+Porter-stem implementation (`meteor.py`; no WordNet in this
environment — documented deviation). `evaluate_dvc` matches predictions to
GT per tIoU (2018-scorer style); `soda_c` runs the SODA dynamic-programming
optimal story matching with tIoU × caption-score rewards.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .meteor import meteor


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu4(hyp: str, refs: List[str]) -> float:
    """Sentence BLEU-4 with brevity penalty + add-ε smoothing."""
    h = hyp.split()
    rs = [r.split() for r in refs]
    if not h:
        return 0.0
    max_n = min(4, len(h))  # short sentences: BLEU over available n-grams
    logp = 0.0
    for n in range(1, max_n + 1):
        hc = _ngrams(h, n)
        max_rc: Counter = Counter()
        for r in rs:
            rc = _ngrams(r, n)
            for k, v in rc.items():
                max_rc[k] = max(max_rc[k], v)
        clipped = sum(min(v, max_rc[k]) for k, v in hc.items())
        total = max(sum(hc.values()), 1)
        p = (clipped + 1e-9) / total
        logp += math.log(p) / max_n
    ref_len = min((abs(len(r) - len(h)), len(r)) for r in rs)[1]
    bp = 1.0 if len(h) > ref_len else math.exp(1 - ref_len / max(len(h), 1))
    return bp * math.exp(logp)


def rouge_l(hyp: str, refs: List[str], beta: float = 1.2) -> float:
    """ROUGE-L F-measure (max over references)."""
    h = hyp.split()

    def lcs(a, b):
        dp = np.zeros((len(a) + 1, len(b) + 1), np.int32)
        for i in range(len(a)):
            for j in range(len(b)):
                dp[i + 1, j + 1] = (
                    dp[i, j] + 1 if a[i] == b[j]
                    else max(dp[i, j + 1], dp[i + 1, j])
                )
        return int(dp[-1, -1])

    best = 0.0
    for ref in refs:
        r = ref.split()
        if not h or not r:
            continue
        l = lcs(h, r)
        prec = l / len(h)
        rec = l / len(r)
        if prec + rec > 0:
            f = (1 + beta ** 2) * prec * rec / (rec + beta ** 2 * prec)
            best = max(best, f)
    return best


def meteor_lite(hyp: str, refs: List[str], alpha: float = 0.9) -> float:
    """Synonym-free METEOR: unigram harmonic mean (recall-weighted), max over
    refs. (The reference uses the Java METEOR jar; WordNet is unavailable
    here — scores are comparable but not identical.)"""
    h = Counter(hyp.split())
    best = 0.0
    for ref in refs:
        r = Counter(ref.split())
        m = sum((h & r).values())
        if m == 0:
            continue
        prec = m / max(sum(h.values()), 1)
        rec = m / max(sum(r.values()), 1)
        best = max(best, prec * rec / (alpha * prec + (1 - alpha) * rec))
    return best


def cider_d(hyps: List[str], refs_list: List[List[str]], n: int = 4,
            sigma: float = 6.0) -> float:
    """Corpus CIDEr-D: tf-idf weighted n-gram cosine with length penalty."""
    M = len(hyps)
    # document frequency over the reference corpus
    df = [defaultdict(int) for _ in range(n)]
    for refs in refs_list:
        seen = [set() for _ in range(n)]
        for r in refs:
            toks = r.split()
            for k in range(n):
                seen[k] |= set(_ngrams(toks, k + 1).keys())
        for k in range(n):
            for g in seen[k]:
                df[k][g] += 1
    log_m = math.log(max(M, 1))

    def tfidf_vec(tokens, k):
        cnt = _ngrams(tokens, k + 1)
        total = max(sum(cnt.values()), 1)
        vec = {}
        for g, c in cnt.items():
            idf = log_m - math.log(max(df[k][g], 1))
            vec[g] = (c / total) * idf
        return vec

    def cos(a, b):
        num = sum(v * b.get(g, 0.0) for g, v in a.items())
        na = math.sqrt(sum(v * v for v in a.values()))
        nb = math.sqrt(sum(v * v for v in b.values()))
        return num / (na * nb) if na > 0 and nb > 0 else 0.0

    scores = []
    for hyp, refs in zip(hyps, refs_list):
        h_toks = hyp.split()
        s = 0.0
        for k in range(n):
            hv = tfidf_vec(h_toks, k)
            acc = 0.0
            for r in refs:
                r_toks = r.split()
                rv = tfidf_vec(r_toks, k)
                delta = len(h_toks) - len(r_toks)
                acc += cos(hv, rv) * math.exp(-(delta ** 2) / (2 * sigma ** 2))
            s += acc / max(len(refs), 1)
        scores.append(10.0 * s / n)
    return float(np.mean(scores)) if scores else 0.0


def _tiou(a: Sequence[float], b: Sequence[float]) -> float:
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


def evaluate_dvc(
    predictions: Dict[str, List[dict]],   # vid → [{timestamp, sentence, score?}]
    ground_truth: Dict[str, List[dict]],  # vid → [{timestamp, sentence}]
    tious: Sequence[float] = (0.3, 0.5, 0.7, 0.9),
) -> Dict[str, float]:
    """2018-scorer style: localization recall/precision averaged over tIoUs +
    caption metrics (BLEU4/METEOR-lite/ROUGE-L/CIDEr) on tIoU-matched pairs."""
    recalls, precisions = [], []
    matched_hyps: List[str] = []
    matched_refs: List[List[str]] = []
    for tiou in tious:
        n_gt = n_pred = n_hit_gt = n_hit_pred = 0
        for vid, gts in ground_truth.items():
            preds = predictions.get(vid, [])
            n_gt += len(gts)
            n_pred += len(preds)
            for g in gts:
                if any(_tiou(p["timestamp"], g["timestamp"]) >= tiou
                       for p in preds):
                    n_hit_gt += 1
            for p in preds:
                best, best_g = 0.0, None
                for g in gts:
                    t = _tiou(p["timestamp"], g["timestamp"])
                    if t > best:
                        best, best_g = t, g
                if best >= tiou:
                    n_hit_pred += 1
                    matched_hyps.append(p["sentence"])
                    matched_refs.append([best_g["sentence"]])
        recalls.append(n_hit_gt / max(n_gt, 1))
        precisions.append(n_hit_pred / max(n_pred, 1))
    out = {
        "recall": 100 * float(np.mean(recalls)),
        "precision": 100 * float(np.mean(precisions)),
    }
    if matched_hyps:
        out["BLEU4"] = 100 * float(np.mean(
            [bleu4(h, r) for h, r in zip(matched_hyps, matched_refs)]
        ))
        out["METEOR"] = 100 * float(np.mean(
            [meteor(h, r) for h, r in zip(matched_hyps, matched_refs)]
        ))
        out["ROUGE_L"] = 100 * float(np.mean(
            [rouge_l(h, r) for h, r in zip(matched_hyps, matched_refs)]
        ))
        out["CIDEr"] = 100 * cider_d(matched_hyps, matched_refs)
    else:
        out.update(BLEU4=0.0, METEOR=0.0, ROUGE_L=0.0, CIDEr=0.0)
    return out


def _parse_sent(sent: str) -> str:
    """para_evaluate.py:26-29: strip non-letters, lowercase, re-join."""
    import re

    return " ".join(re.sub("[^a-zA-Z]", " ", sent).strip().lower().split())


def _bleu_n(hyp: str, refs: List[str], n: int) -> float:
    """Sentence BLEU-n (geometric mean of 1..n-gram precisions + BP)."""
    h = hyp.split()
    rs = [r.split() for r in refs if r.split()]
    if not h or not rs:
        return 0.0
    max_n = min(n, len(h))
    logp = 0.0
    for k in range(1, max_n + 1):
        hc = _ngrams(h, k)
        max_rc: Counter = Counter()
        for r in rs:
            for g, v in _ngrams(r, k).items():
                max_rc[g] = max(max_rc[g], v)
        clipped = sum(min(v, max_rc[g]) for g, v in hc.items())
        p = (clipped + 1e-9) / max(sum(hc.values()), 1)
        logp += math.log(p) / max_n
    ref_len = min((abs(len(r) - len(h)), len(r)) for r in rs)[1]
    bp = 1.0 if len(h) > ref_len else math.exp(1 - ref_len / max(len(h), 1))
    return bp * math.exp(logp)


def evaluate_para(
    predictions: Dict[str, List[dict]],   # vid → [{sentence, ...}] in order
    para_ground_truth: "Dict[str, str] | List[Dict[str, str]]",
) -> Dict[str, float]:
    """Paragraph-captioning evaluation (the PDVC suite's second advertised
    capability): per video, the predicted events' sentences are concatenated
    IN STORED ORDER into one paragraph and scored against the paragraph GT
    with corpus-averaged BLEU1-4 / METEOR / ROUGE-L / CIDEr, keys prefixed
    ``para_``. Matches densevid_eval3/para_evaluate.py:108-125 +
    eval_para.py (sentence normalization = parse_sent: letters only,
    lowercased). Videos missing from `predictions` score as empty hyps,
    exactly like the reference's `[''],`.

    para_ground_truth: {vid: paragraph} or a list of such dicts (multiple
    reference files).
    """
    gts_list = (
        para_ground_truth if isinstance(para_ground_truth, list)
        else [para_ground_truth]
    )
    vid_ids = sorted({v for gt in gts_list for v in gt.keys()})
    hyps: List[str] = []
    refs: List[List[str]] = []
    for vid in vid_ids:
        events = predictions.get(vid, [])
        para = ". ".join(e["sentence"] for e in events)
        hyps.append(_parse_sent(para))
        refs.append([_parse_sent(gt[vid]) for gt in gts_list if vid in gt])
    out: Dict[str, float] = {}
    for n in range(1, 5):
        out[f"para_Bleu_{n}"] = 100 * float(np.mean(
            [_bleu_n(h, r, n) for h, r in zip(hyps, refs)])) if hyps else 0.0
    out["para_METEOR"] = 100 * float(np.mean(
        [meteor(h, r) for h, r in zip(hyps, refs)])) if hyps else 0.0
    out["para_ROUGE_L"] = 100 * float(np.mean(
        [rouge_l(h, r) for h, r in zip(hyps, refs)])) if hyps else 0.0
    out["para_CIDEr"] = 100 * cider_d(hyps, refs) if hyps else 0.0
    return out


def rerank_predictions(
    predictions: Dict[str, List[dict]],
    alpha: float = 0.3,
    temperature: float = 2.0,
) -> Dict[str, List[dict]]:
    """Score reranking (eval_utils.py:144-166): joint_score =
    alpha·sentence_score/len(sentence)^temperature + proposal_score; keep the
    top `pred_event_count` (of the highest-joint-score event) proposals,
    re-sorted by timestamp. Events need `sentence_score`, `proposal_score`
    and `pred_event_count` fields (emitted by CaptioningTrainer.predict)."""
    out: Dict[str, List[dict]] = {}
    for vid, events in predictions.items():
        if not events:
            out[vid] = []
            continue
        scored = []
        for e in events:
            nwords = float(len(e["sentence"].split()))
            joint = (alpha * e["sentence_score"]
                     / (nwords ** temperature + 1e-5)
                     + e["proposal_score"])
            scored.append((joint, e))
        scored.sort(key=lambda t: t[0], reverse=True)
        top_n = int(scored[0][1].get("pred_event_count", len(scored)))
        kept = [e for _, e in scored[: max(top_n, 1)]]
        kept.sort(key=lambda e: e["timestamp"])
        out[vid] = kept
    return out


def soda_c(predictions: Dict[str, List[dict]],
           ground_truth: Dict[str, List[dict]]) -> float:
    """SODA-c (eval_soda.py:45): per-video optimal order-preserving
    matching (DP) of predictions to GT with reward = tIoU × METEOR-lite;
    F-measure averaged over videos."""
    fs = []
    for vid, gts in ground_truth.items():
        preds = predictions.get(vid, [])
        if not preds or not gts:
            fs.append(0.0)
            continue
        n, m = len(preds), len(gts)
        score = np.zeros((n, m))
        for i, p in enumerate(preds):
            for j, g in enumerate(gts):
                iou = _tiou(p["timestamp"], g["timestamp"])
                score[i, j] = iou * meteor(p["sentence"], [g["sentence"]])
        # DP: order-preserving max-sum matching
        dp = np.zeros((n + 1, m + 1))
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i, j] = max(dp[i - 1, j], dp[i, j - 1],
                               dp[i - 1, j - 1] + score[i - 1, j - 1])
        total = dp[n, m]
        prec = total / n
        rec = total / m
        fs.append(2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0)
    return 100 * float(np.mean(fs)) if fs else 0.0
