"""METEOR with exact + Porter-stem matching and the chunk fragmentation
penalty — the protocol-comparable scorer for dense-captioning eval.

Reference: the dense-captioning suite scores METEOR via the Java METEOR jar
(/root/reference/video-mamba-suite/video-dense-captioning/densevid_eval3/
evaluate2018.py / evaluate2021.py → pycocoevalcap Meteor wrapper). The jar
is unavailable here; this is a faithful pure-Python implementation of the
METEOR-1.0 scoring semantics (Banerjee & Lavie 2005; the same parametrization
nltk.translate.meteor_score replicates): sequential matcher stages
(exact → stem), one-to-one alignment, F_mean = P·R/(α·P+(1−α)·R) with
α=0.9, fragmentation penalty γ·(chunks/matches)^β with β=3, γ=0.5.

DOCUMENTED DEVIATION: the WordNet synonym stage is omitted (no WordNet in
this environment), so scores are protocol-comparable but can differ from the
jar on synonym-matched pairs. Everything else — Porter stemming, alignment
order, chunk counting, parameters — follows the published algorithm.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

_VOWELS = "aeiou"


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """The Porter 'm' value: number of VC sequences."""
    forms = []
    for i in range(len(stem)):
        forms.append("c" if _is_consonant(stem, i) else "v")
    s = "".join(forms)
    # collapse runs
    collapsed = []
    for ch in s:
        if not collapsed or collapsed[-1] != ch:
            collapsed.append(ch)
    return "".join(collapsed).count("vc")


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_consonant(word, len(word) - 1))


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (_is_consonant(word, len(word) - 3)
            and not _is_consonant(word, len(word) - 2)
            and _is_consonant(word, len(word) - 1)
            and word[-1] not in "wxy")


def porter_stem(word: str) -> str:
    """Porter (1980) stemming algorithm, standard definition."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
        # the step-4 "(s|t)ion" rule takes precedence as the longest match
        if _measure(w[:-3]) > 1:
            w = w[:-3]
    else:
        for suf in sorted(step4, key=len, reverse=True):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _measure(stem) > 1:
                    w = stem
                break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _align(hyp: Sequence[str], ref: Sequence[str]) -> List[Tuple[int, int]]:
    """One-to-one (hyp_idx, ref_idx) alignment via sequential stages:
    exact match first, then Porter-stem match on the leftovers (the jar's
    module order with the synonym stage omitted).

    Tie-breaking follows nltk.translate.meteor_score exactly (hypothesis
    words scanned DESCENDING, each matched to the LAST still-free reference
    occurrence) so the two independent implementations agree bit-for-bit
    on every sentence pair — the conformance test in
    tests/test_caption_protocol.py asserts this."""
    matches: List[Tuple[int, int]] = []
    h_free = set(range(len(hyp)))
    r_free = set(range(len(ref)))

    def stage(key):
        r_by_key = {}
        for j in sorted(r_free):
            r_by_key.setdefault(key(ref[j]), []).append(j)
        for i in sorted(h_free, reverse=True):
            k = key(hyp[i])
            if r_by_key.get(k):
                j = r_by_key[k].pop()
                matches.append((i, j))
                h_free.discard(i)
                r_free.discard(j)

    stage(lambda w: w)
    stage(porter_stem)
    return sorted(matches)


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    """Fewest contiguous-in-both aligned spans (matches sorted by hyp idx)."""
    if not matches:
        return 0
    chunks = 1
    for (i0, j0), (i1, j1) in zip(matches, matches[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return chunks


def meteor_stats(hypothesis: str, reference: str) -> Tuple[int, int, int, int]:
    """Alignment statistics of one pair: (matches, chunks, hyp_len, ref_len).

    The jar's system-level score sums these over segments before computing
    P/R/F-mean/penalty once (scorers.meteor_corpus); per-pair scoring
    derives from the same stats."""
    hyp = hypothesis.lower().split()
    ref = reference.lower().split()
    matches = _align(hyp, ref)
    return len(matches), _count_chunks(matches), len(hyp), len(ref)


def meteor_pair(hypothesis: str, reference: str, alpha: float = 0.9,
                beta: float = 3.0, gamma: float = 0.5) -> float:
    """METEOR score of one hypothesis/reference pair."""
    m, chunks, len_h, len_r = meteor_stats(hypothesis, reference)
    if m == 0 or len_h == 0 or len_r == 0:
        return 0.0
    precision = m / len_h
    recall = m / len_r
    f_mean = precision * recall / (alpha * precision + (1 - alpha) * recall)
    penalty = gamma * (chunks / m) ** beta
    return f_mean * (1.0 - penalty)


def meteor(hypothesis: str, references: List[str], alpha: float = 0.9,
           beta: float = 3.0, gamma: float = 0.5) -> float:
    """Max over references (the multi-reference protocol)."""
    if not references:
        return 0.0
    return max(meteor_pair(hypothesis, r, alpha, beta, gamma)
               for r in references)
