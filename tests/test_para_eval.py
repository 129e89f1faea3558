"""Paragraph-captioning eval + score reranking (reference:
video-dense-captioning/eval_utils.py:112-166 + densevid_eval3/eval_para).
Hand-computed fixtures."""

import math

import numpy as np
import pytest

from video_mamba_suite_tpu.tasks.captioning.metrics import (
    _bleu_n,
    _parse_sent,
    evaluate_para,
    rerank_predictions,
)


def test_parse_sent_matches_reference_normalization():
    # para_evaluate.py:26-29 — letters only, lowercase
    assert _parse_sent("A man, RUNS. fast!!") == "a man runs fast"
    assert _parse_sent("123 !!") == ""


def test_bleu_n_perfect_match():
    for n in range(1, 5):
        assert _bleu_n("a b c d e", ["a b c d e"], n) == pytest.approx(
            1.0, abs=1e-6)


def test_bleu_1_hand_computed():
    # hyp "a b c", ref "a b d": unigram precision 2/3 (+eps), no BP (len eq)
    got = _bleu_n("a b c", ["a b d"], 1)
    assert got == pytest.approx(2 / 3, rel=1e-6)


def test_evaluate_para_perfect_prediction():
    preds = {
        "v1": [dict(sentence="a man runs"), dict(sentence="he jumps high")],
    }
    para_gt = {"v1": "A man runs. He jumps high."}
    out = evaluate_para(preds, para_gt)
    # concatenated paragraph normalizes to exactly the GT paragraph
    assert out["para_Bleu_4"] == pytest.approx(100.0, abs=1e-4)
    assert out["para_ROUGE_L"] == pytest.approx(100.0, abs=1e-4)
    # METEOR-1.5 semantics (the protocol jar's parametrization): a perfect
    # match does NOT score 1.0 — the fragmentation penalty γ·(ch/m)^β with
    # β=0.2 stays material even at 1 chunk (γ·(1/6)^0.2 ≈ 0.42). Golden
    # pinned from the 1.5 scoring function (meteor.py).
    assert out["para_METEOR"] == pytest.approx(58.070373, abs=1e-3)


def test_evaluate_para_missing_video_scores_empty():
    preds = {}
    para_gt = {"v1": "a man runs"}
    out = evaluate_para(preds, para_gt)
    assert out["para_Bleu_1"] == 0.0
    assert out["para_METEOR"] == 0.0


def test_evaluate_para_multiple_refs():
    preds = {"v1": [dict(sentence="the dog barks")]}
    gt1 = {"v1": "a cat sleeps"}
    gt2 = {"v1": "the dog barks"}
    out = evaluate_para(preds, [gt1, gt2])
    assert out["para_Bleu_1"] == pytest.approx(100.0, abs=1e-4)  # max over refs


def test_rerank_predictions_hand_computed():
    # joint = alpha·sent_score/len^temp + prop_score (eval_utils.py:153-155)
    ev = lambda s, ss, ps, cnt, t0: dict(  # noqa: E731
        sentence=s, sentence_score=ss, proposal_score=ps,
        pred_event_count=cnt, timestamp=[t0, t0 + 1.0])
    # two words → len^2 = 4: joint_a = 0.3·(-0.4)/4.00001 + 0.9 ≈ 0.870
    #                         joint_b = 0.3·(-8.0)/4.00001 + 0.95 ≈ 0.350
    a = ev("good one", -0.4, 0.9, 1, 5.0)
    b = ev("bad cap", -8.0, 0.95, 3, 1.0)
    out = rerank_predictions({"v": [b, a]}, alpha=0.3, temperature=2.0)
    # a wins the joint score; its pred_event_count=1 keeps only a
    assert len(out["v"]) == 1
    assert out["v"][0]["sentence"] == "good one"

    # with count 2 both survive, re-sorted by timestamp (b starts earlier)
    a2 = dict(a, pred_event_count=2)
    out = rerank_predictions({"v": [b, a2]}, alpha=0.3, temperature=2.0)
    assert [e["sentence"] for e in out["v"]] == ["bad cap", "good one"]


def test_rerank_joint_score_value():
    e = dict(sentence="w x", sentence_score=-1.0, proposal_score=0.5,
             pred_event_count=1, timestamp=[0.0, 1.0])
    out = rerank_predictions({"v": [e]}, alpha=0.3, temperature=2.0)
    expected = 0.3 * (-1.0) / (4.0 + 1e-5) + 0.5
    # survives (only event) — recompute joint independently to pin the formula
    assert math.isclose(expected, 0.425, rel_tol=1e-3)
    assert out["v"][0]["sentence"] == "w x"
