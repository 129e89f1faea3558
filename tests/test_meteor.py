"""METEOR scorer: Porter stemmer vectors + alignment/penalty semantics.

Canonical cases from Porter (1980) and the METEOR-1.0 definition (the
parametrization nltk.translate.meteor_score replicates).
"""

import pytest

from video_mamba_suite_tpu.tasks.captioning.meteor import (
    _align,
    _count_chunks,
    meteor,
    meteor_pair,
    porter_stem,
)


@pytest.mark.parametrize("word,stem", [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("hopping", "hop"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("happy", "happi"),
    ("relational", "relat"),
    ("rational", "ration"),
    ("generalizations", "gener"),
    ("oscillators", "oscil"),
    ("sky", "sky"),
    ("running", "run"),
])
def test_porter_stem_canonical(word, stem):
    assert porter_stem(word) == stem


def test_meteor_identical_sentences():
    s = "the cat sat on the mat"
    # m=6, P=R=F=1, 1 chunk → penalty 0.5·(1/6)³
    assert meteor_pair(s, s) == pytest.approx(1 - 0.5 * (1 / 6) ** 3)


def test_meteor_fully_scrambled_penalty():
    hyp = "on the mat sat the cat"
    ref = "the cat sat on the mat"
    # all 6 unigrams match but in 6 chunks → penalty 0.5·1³ → F·0.5 = 0.5
    assert meteor_pair(hyp, ref) == pytest.approx(0.5)


def test_meteor_stem_stage_matches_inflections():
    # 'running'/'runs' only match through the Porter stage
    no_stem = meteor_pair("he runs fast", "he jumped quickly")
    with_stem = meteor_pair("the dog running home", "the dog runs home")
    assert with_stem > 0.8
    assert no_stem < with_stem


def test_meteor_no_match_zero():
    assert meteor_pair("alpha beta", "gamma delta") == 0.0
    assert meteor("alpha beta", []) == 0.0


def test_meteor_max_over_references():
    hyp = "a man plays guitar"
    refs = ["completely unrelated text", "a man plays guitar"]
    assert meteor(hyp, refs) == meteor_pair(hyp, refs[1])


def test_alignment_one_to_one_and_chunks():
    m = _align("the the cat".split(), "the cat".split())
    # each ref word used once
    assert len(m) == 2
    assert _count_chunks(sorted(m)) <= 2
    # contiguous in both → one chunk
    assert _count_chunks([(0, 0), (1, 1), (2, 2)]) == 1
    assert _count_chunks([(0, 0), (2, 1)]) == 2


def test_recall_weighting():
    # alpha=0.9 weights recall: missing hyp words hurt less than missing
    # ref words
    short_hyp = meteor_pair("the cat", "the cat sat on the mat")
    short_ref = meteor_pair("the cat sat on the mat", "the cat")
    assert short_ref > short_hyp
