"""Protocol conformance of the corpus caption scorers (scorers.py).

Two kinds of evidence (the protocol scorers themselves — pycocoevalcap +
the METEOR-1.5 jar — cannot run here: no JVM, no WordNet data):

1. CROSS-VALIDATION against nltk's independent implementations: Porter
   stemmer (original-algorithm mode) and METEOR (same α/β/γ parametrization,
   WordNet stage disabled via a null reader) must agree BIT-FOR-BIT; corpus
   BLEU must match nltk.corpus_bleu up to the documented pycocoevalcap
   epsilon constants.
2. GOLDEN VALUES hand-derived from the protocol algorithm definitions
   (pycocoevalcap bleu_scorer/cider_scorer/rouge semantics), computed
   independently inside the test — epsilon chains, idf quirks, clipping,
   max-prec/max-rec combine and all.

Reference protocol: video-dense-captioning/densevid_eval3/evaluate2018.py,
para_evaluate.py, eval_utils.py:112-166. Drift bounds: PARITY.md.
"""

import math
import random

import pytest

from video_mamba_suite_tpu.tasks.captioning.meteor import (
    meteor_pair,
    meteor_stats,
    porter_stem,
)
from video_mamba_suite_tpu.tasks.captioning.scorers import (
    bleu_corpus,
    cider_corpus,
    meteor_corpus,
    ptb_tokenize,
    rouge_l_corpus,
    rouge_l_pair,
)


class _NoWordnet:
    """Disables nltk's synonym stage — leaves exact+stem, i.e. the stages
    the in-repo METEOR implements (the documented jar deviation)."""

    def synsets(self, _word):
        return []


_VOCAB = """running cooked cooking cooks jumps jumping quickly slowly
happiness caresses ponies ties caress cats feed agreed plastered bled
motoring sing conflated troubled sized hopping tanned falling hissing fizzed
failing filing relational conditional rational valenci hesitanci digitizer
conformabli radicalli differentli vileli analogousli vietnamization
predication operator feudalism decisiveness hopefulness callousness formaliti
sensitiviti sensibiliti triplicate formative formalize electriciti electrical
hopeful goodness revival allowance inference airliner gyroscopic adjustable
defensible irritant replacement adjustment dependent adoption homologou
communism activate angulariti homologi effective bowdlerize probate rate
cease controll roll skies sky die dying lying tying news innings proceed
exceed succeed""".split()


def test_porter_stem_matches_nltk_original_algorithm():
    nltk = pytest.importorskip("nltk")
    from nltk.stem.porter import PorterStemmer

    ps = PorterStemmer(mode="ORIGINAL_ALGORITHM")
    for w in _VOCAB:
        assert porter_stem(w) == ps.stem(w), w


def test_meteor_pair_matches_nltk_bit_for_bit():
    """Same α/β/γ, same stages (exact + original-Porter stem), same
    tie-breaking: two independent implementations, zero drift."""
    nltk = pytest.importorskip("nltk")
    from nltk.stem.porter import PorterStemmer
    from nltk.translate.meteor_score import single_meteor_score

    ps = PorterStemmer(mode="ORIGINAL_ALGORITHM")
    nw = _NoWordnet()
    rng = random.Random(0)
    words = ("the a man dog cat runs running jumped jumps over quick quickly"
             " brown lazy eats cooking cooked food ball park happy").split()
    for _ in range(400):
        h = [rng.choice(words) for _ in range(rng.randint(1, 12))]
        r = [rng.choice(words) for _ in range(rng.randint(1, 12))]
        mine = meteor_pair(" ".join(h), " ".join(r))
        theirs = single_meteor_score(r, h, stemmer=ps, wordnet=nw)
        assert mine == pytest.approx(theirs, abs=1e-12), (h, r)


def test_bleu_corpus_matches_nltk_corpus_bleu():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu

    res = {
        0: ["the cat sat on the mat"],
        1: ["a quick brown fox jumps over the lazy dog"],
        2: ["people are walking in the park today"],
    }
    gts = {
        0: ["the cat sat on a mat", "there is a cat on the mat"],
        1: ["the quick brown fox jumped over a lazy dog"],
        2: ["several people walk in the park", "people walking in a park"],
    }
    ours, _ = bleu_corpus(gts, res, 4)
    hyps = [res[i][0].split() for i in range(3)]
    refs = [[r.split() for r in gts[i]] for i in range(3)]
    for n in range(1, 5):
        w = tuple([1.0 / n] * n)
        want = corpus_bleu(refs, hyps, weights=w)
        # pycocoevalcap's tiny/small epsilons shift the value by ~1e-9
        assert ours[n - 1] == pytest.approx(want, abs=1e-6), n


def test_bleu_corpus_epsilon_chain_golden():
    """3-token perfect hypothesis: guess_4 = 0 → the pycocoevalcap chain
    gives ((1+tiny)/(1+small))^3·(tiny/small) under the 4th root — the
    protocol's signature low-order BLEU_4 for short sentences."""
    res = {0: ["a man cooks"]}
    gts = {0: ["a man cooks"]}
    ours, _ = bleu_corpus(gts, res, 4)
    tiny, small = 1e-15, 1e-9
    p = 1.0
    golden = []
    for correct, guess in [(3, 3), (2, 2), (1, 1), (0, 0)]:
        p *= (correct + tiny) / (guess + small)
        golden.append(p ** (1.0 / (len(golden) + 1)))
    for k in range(4):
        assert ours[k] == pytest.approx(golden[k], rel=1e-9)
    assert ours[3] == pytest.approx((1e-15 / 1e-9) ** 0.25, rel=1e-3)


def test_cider_corpus_golden_perfect_pairs():
    """Two single-ref instances, both exact matches: idf = log 2 for every
    n-gram, similarity 1 per n-level with support, score = 10·(support/4)."""
    gts = {0: ["a b"], 1: ["c d"]}
    res = {0: ["a b"], 1: ["c d"]}
    score, per = cider_corpus(gts, res)
    # 2-token sentences support n=1,2 only → 10·(1+1+0+0)/4 = 5.0
    assert score == pytest.approx(5.0, abs=1e-12)
    assert per == pytest.approx([5.0, 5.0], abs=1e-12)

    # 4-token perfect pairs support all n-levels → the full 10.0
    gts4 = {0: ["a b c d"], 1: ["e f g h"]}
    score4, _ = cider_corpus(gts4, gts4)
    assert score4 == pytest.approx(10.0, abs=1e-12)


def test_cider_corpus_clipping_and_length_penalty_golden():
    """Hand-derived: hyp 'a a' vs ref 'a' (plus a disjoint filler instance
    for non-zero idf). Unigram: idf = log2; hyp vec = 2·idf, ref vec = idf;
    clipped numerator min(2idf, idf)·idf = idf²; norms 2idf·idf →
    cos = 0.5; δ = 1 → ×exp(-1/72); no higher-order support."""
    gts = {0: ["a"], 1: ["b c"]}
    res = {0: ["a a"], 1: ["x y"]}
    score, per = cider_corpus(gts, res)
    want0 = 10.0 * (0.5 * math.exp(-1.0 / (2 * 6.0 ** 2))) / 4
    assert per[0] == pytest.approx(want0, abs=1e-12)
    assert per[1] == 0.0
    assert score == pytest.approx(want0 / 2, abs=1e-12)


def test_cider_single_instance_quirk():
    """len(corpus)=1 → ref_len = log 1 = 0 → every idf 0 → score 0: the
    protocol scorer's per-video behavior, reproduced deliberately."""
    score, _ = cider_corpus({0: ["a b c d"]}, {0: ["a b c d"]})
    assert score == 0.0


def test_rouge_protocol_max_prec_max_rec_combine():
    """pycocoevalcap combines max-precision and max-recall over refs taken
    SEPARATELY (possibly from different refs) — not max-F."""
    hyp = "a b c d"
    refs = ["a b", "a b c d e f g h"]
    # prec: [2/4, 4/4] → max 1.0; rec: [2/2, 4/8] → max 1.0 → F = 1.0
    assert rouge_l_pair(hyp, refs) == pytest.approx(1.0, abs=1e-12)
    # max-F over refs would be < 0.71 — assert we're NOT doing that
    beta = 1.2
    f1 = (1 + beta ** 2) * 0.5 * 1.0 / (1.0 + beta ** 2 * 0.5)
    f2 = (1 + beta ** 2) * 1.0 * 0.5 / (0.5 + beta ** 2 * 1.0)
    assert max(f1, f2) < 0.75

    mean, per = rouge_l_corpus({0: refs, 1: ["x y"]},
                               {0: [hyp], 1: ["x y"]})
    assert per == pytest.approx([1.0, 1.0], abs=1e-12)
    assert mean == pytest.approx(1.0, abs=1e-12)


def test_meteor_corpus_aggregates_statistics_not_scores():
    """The jar's system-level score sums (matches, chunks, len) over
    segments before the F-mean/penalty — different from the mean of
    per-segment scores; golden value derived from the summed stats."""
    gts = {0: ["a b c d"], 1: ["w x y z"]}
    res = {0: ["a b c d"], 1: ["q r"]}
    m0 = meteor_stats("a b c d", "a b c d")      # (4, 1, 4, 4)
    m1 = meteor_stats("q r", "w x y z")          # (0, 0, 2, 4)
    assert m0 == (4, 1, 4, 4) and m1 == (0, 0, 2, 4)
    m, ch, lh, lr = 4, 1, 6, 8
    p, r = m / lh, m / lr
    f = p * r / (0.9 * p + 0.1 * r)
    golden = f * (1 - 0.5 * (ch / m) ** 3)
    score, seg = meteor_corpus(gts, res, version="1.0")
    assert score == pytest.approx(golden, abs=1e-12)
    # ≠ the mean of segment scores (which would be ~0.496)
    assert score != pytest.approx((seg[0] + seg[1]) / 2, abs=1e-3)


def test_meteor15_pair_golden_hand_derived():
    """METEOR-1.5 English semantics (Meteor Universal eqns, α=.85 β=.2
    γ=.6 δ=.75; stage weights exact 1.0 / stem 0.6; content/function
    weighting) on hand-worked examples."""
    from video_mamba_suite_tpu.tasks.captioning.meteor import (
        FUNCTION_WORDS,
        meteor15_pair,
        meteor15_stats,
    )

    # identical sentences, all content words: P = R = 1, one chunk of 3
    s = "man cooks food"
    assert not any(w in FUNCTION_WORDS for w in s.split())
    st = meteor15_stats(s, s)
    assert st.matches == 3 and st.chunks == 1
    assert st.m_h_content == (3, 0) and st.m_h_function == (0, 0)
    pen = 0.6 * (1 / 3) ** 0.2
    assert meteor15_pair(s, s) == pytest.approx(1.0 * (1 - pen), abs=1e-12)

    # mixed content/function, exact matches only: "the man" vs "the dog".
    # match = {the}: function on both sides. δ-weighted:
    # P = R = (1-δ)·1 / (δ·1 + (1-δ)·1) = 0.25/1.0
    st = meteor15_stats("the man", "the dog")
    assert st.matches == 1 and st.chunks == 1
    assert st.m_h_function == (1, 0) and st.m_h_content == (0, 0)
    p = r = 0.25
    f = p * r / (0.85 * p + 0.15 * r)
    want = f * (1 - 0.6 * (1 / 1) ** 0.2)
    assert meteor15_pair("the man", "the dog") == pytest.approx(
        want, abs=1e-12)

    # stem-stage match gets weight 0.6: "runs" vs "running" (both content)
    st = meteor15_stats("runs", "running")
    assert st.matches == 1
    assert st.m_h_content == (0, 1)   # stage 1 = stem
    p = r = 0.6 * 0.75 / 0.75         # w_stem·δ·1 / (δ·1)
    f = p * r / (0.85 * p + 0.15 * r)
    want = f * (1 - 0.6)              # chunks/m = 1 → penalty γ·1^β = γ
    assert meteor15_pair("runs", "running") == pytest.approx(want, abs=1e-12)

    # no match → 0
    assert meteor15_pair("alpha beta", "gamma delta") == 0.0


def test_meteor_corpus_15_aggregates_statistics():
    """The 1.5 corpus score sums Meteor15Stats over segments (jar
    aggregation), computed once from totals — pinned golden."""
    from video_mamba_suite_tpu.tasks.captioning.meteor import (
        Meteor15Stats,
        meteor15_from_stats,
        meteor15_stats,
    )

    gts = {0: ["a man cooks food"], 1: ["the dog runs home"]}
    res = {0: ["a man cooks food"], 1: ["cats sleep"]}
    tot = Meteor15Stats.zero()
    tot = tot + meteor15_stats(res[0][0], gts[0][0])
    tot = tot + meteor15_stats(res[1][0], gts[1][0])
    want = meteor15_from_stats(tot)
    score, seg = meteor_corpus(gts, res)   # version="1.5" is the default
    assert score == pytest.approx(want, abs=1e-12)
    assert seg[1] == 0.0
    # and it differs from the 1.0 parametrization (regression guard that
    # the default really switched)
    assert score != pytest.approx(
        meteor_corpus(gts, res, version="1.0")[0], abs=1e-6)


def test_ptb_tokenize_protocol_cases():
    assert ptb_tokenize("A man, isn't COOKING... the dog's food!") == \
        "a man is n't cooking the dog 's food"
    assert ptb_tokenize("He said: go -- now; really?") == "he said go now really"
    # the 2018 evaluator's garbage reference must stay unmatchable
    garbage = ptb_tokenize("abc123!@#")
    assert "abc123" in garbage
    # non-ascii → space (evaluate2018.py remove_nonascii)
    assert ptb_tokenize("café") == "caf"


def test_evaluate_dvc_garbage_pairs_and_all_overlap():
    """Protocol pair construction: one prediction overlapping TWO GTs at a
    low tIoU yields TWO instances; a prediction overlapping nothing pairs
    with the garbage ref and drags the per-video score down."""
    from video_mamba_suite_tpu.tasks.captioning import evaluate_dvc

    gt = {"v": [
        dict(timestamp=[0.0, 10.0], sentence="a man cooks dinner"),
        dict(timestamp=[8.0, 18.0], sentence="a man cooks dinner"),
    ]}
    # pred overlaps both GTs at tIoU 0.3 (IoU vs g1 = 8/12 ≈ 0.67 > 0.3)
    preds_good = {"v": [dict(timestamp=[0.0, 10.0],
                             sentence="a man cooks dinner")]}
    res_good = evaluate_dvc(preds_good, gt, tious=(0.3,))
    # both pairs perfect — METEOR-1.5 scores a perfect 4-word pair
    # 1 − 0.6·(chunks/matches)^0.2 (corpus: m=8, ch=2) ≈ 0.545
    assert res_good["METEOR"] == pytest.approx(
        100 * (1 - 0.6 * (2 / 8) ** 0.2), abs=1e-6)

    # add a non-overlapping prediction → garbage pair at every tIoU
    preds_mixed = {"v": preds_good["v"] + [
        dict(timestamp=[100.0, 110.0], sentence="a man cooks dinner")]}
    res_mixed = evaluate_dvc(preds_mixed, gt, tious=(0.3,))
    assert res_mixed["METEOR"] < res_good["METEOR"]
    assert res_mixed["precision"] == pytest.approx(50.0)


def test_evaluate_dvc_averages_per_video_then_tiou():
    """Scorers run per video and are averaged over videos (evaluate2018
    :229-247), so one perfect and one empty-prediction video average to
    half the perfect score at every tIoU."""
    from video_mamba_suite_tpu.tasks.captioning import evaluate_dvc

    gt = {
        "v1": [dict(timestamp=[0.0, 10.0], sentence="a man cooks dinner")],
        "v2": [dict(timestamp=[0.0, 10.0], sentence="a man cooks dinner")],
    }
    preds = {"v1": [dict(timestamp=[0.0, 10.0],
                         sentence="a man cooks dinner")]}
    res = evaluate_dvc(preds, gt, tious=(0.5,))
    only = evaluate_dvc(preds, {"v1": gt["v1"]}, tious=(0.5,))
    assert res["METEOR"] == pytest.approx(only["METEOR"] / 2, abs=1e-9)
    assert res["recall"] == pytest.approx(50.0)


def test_evaluate_para_corpus_level_bleu():
    """para_evaluate runs ONE corpus compute_score over all videos — a
    short and a long video pool their n-gram counts (≠ mean of per-video
    BLEUs). Validated against nltk corpus_bleu."""
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu

    from video_mamba_suite_tpu.tasks.captioning import evaluate_para

    # all hyps ≥ 4 tokens: for EMPTY n-gram sets nltk clamps the
    # per-instance denominator to 1 where pycocoevalcap (and we) keep the
    # true 0 — outside that corner the algorithms coincide
    preds = {
        "v1": [dict(sentence="a man runs very fast")],
        "v2": [dict(sentence="the quick brown fox jumps over the lazy dog"
                             " near the river bank")],
    }
    para_gt = {
        "v1": "a man walks very fast",
        "v2": "the quick brown fox jumps over the lazy dog near the river",
    }
    out = evaluate_para(preds, para_gt)
    hyps = ["a man runs very fast".split(),
            "the quick brown fox jumps over the lazy dog near the river"
            " bank".split()]
    refs = [["a man walks very fast".split()],
            ["the quick brown fox jumps over the lazy dog near the"
             " river".split()]]
    for n in range(1, 5):
        want = corpus_bleu(refs, hyps, weights=tuple([1.0 / n] * n))
        assert out[f"para_Bleu_{n}"] == pytest.approx(100 * want, abs=1e-4), n
