"""Porter stemmer — the ``text_en`` stemming stage.

Reference parity: PorterStemFilter
(lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
PorterStemFilter.java:57-76) applies Martin Porter's 1980 algorithm
("An algorithm for suffix stripping", Program 14(3):130-137) to each
already-lowercased token; the stemmer itself is
``.../en/PorterStemmer.java``, the author's own Java release of the
algorithm.  This module implements the algorithm from the published
specification (https://tartarus.org/martin/PorterStemmer/def.txt) with the
implementation's two endorsed departures from the paper — step-2
``bli -> ble`` (paper: ``abli -> able``) and the extra step-2 rule
``logi -> log`` — and is validated token-for-token against the reference's
own 23,531-word golden set
(lucene/analysis/common/src/test/.../en/porterTestData.zip voc/output) in
tests/test_stemmer.py.

Spark shape (see ``stem_map_df`` / ``stemmed_tokens``): stemming is a pure
per-string function, so at corpus scale it runs over the DISTINCT VOCABULARY
(an Arrow-batched pandas pass over ~|V| short strings), never over the token
stream; tokens map through a term-keyed join against that dictionary.  At
10^12 docs the vocabulary is orders of magnitude smaller than the token
stream and the join rides the same term partitioning the postings build
already shuffles on.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd  # module-top: pandas_udf resolves annotations here

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    """Is w[i] a consonant?  'y' counts as a consonant at position 0 and
    after a vowel; after a consonant it acts as a vowel (spec §"A consonant
    ...")."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel->consonant alternations."""
    n = len(stem)
    i = 0
    while i < n and _cons(stem, i):
        i += 1
    m = 0
    while i < n:
        while i < n and not _cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant with the final consonant not
    w, x or y (spec step 1b / 5a condition)."""
    n = len(w)
    if n < 3:
        return False
    return (
        _cons(w, n - 3)
        and not _cons(w, n - 2)
        and _cons(w, n - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement) rule tables; within a step the LONGEST matching
# suffix is selected first and it alone is tested against the m-condition
# (spec: "only one is obeyed, and this will be the one with the longest
# matching S1").
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _longest_rule(w: str, rules) -> tuple[str, str] | None:
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


@lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    """Stem one already-lowercased token.  Tokens of length <= 2 pass
    through unchanged (PorterStemmer.java stem(): ``if (k > 1)``)."""
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a: plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        cleanup = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            cleanup = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            cleanup = True
        if cleanup:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # ---- step 1c: y -> i when the stem has a vowel
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (m(stem) > 0)
    rule = _longest_rule(w, _STEP2)
    if rule is not None:
        suf, rep = rule
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # ---- step 3 (m(stem) > 0)
    rule = _longest_rule(w, _STEP3)
    if rule is not None:
        suf, rep = rule
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    # ---- step 4 (m(stem) > 1; 'ion' additionally needs stem ending s/t)
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or stem[-1:] in ("s", "t")):
            w = stem

    # ---- step 5a: drop trailing e
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # ---- step 5b: -ll -> -l when m > 1
    if w.endswith("ll") and _measure(w[:-1]) > 1:
        w = w[:-1]

    return w


_STEP2_CLASSIC = tuple(
    (a, b) for a, b in _STEP2 if a not in ("bli", "logi")
) + (("abli", "able"),)


@lru_cache(maxsize=1 << 16)
def porter_classic_stem(word: str) -> str:
    """The strict 1980-paper Porter algorithm — SnowballPorterFilterFactory
    language="Porter" (org.tartarus.snowball.ext.PorterStemmer via
    SnowballFilter, graded by TestSnowballVocab.java porter/).  Differs from
    :func:`porter_stem` (the author's updated Java release) in exactly three
    ways: no minimum-length guard (so "as" -> "a"), step-2 ``abli -> able``
    instead of ``bli -> ble``, and no ``logi -> log`` rule.  Validated
    against the reference's full 30,428-word snowball porter vocabulary in
    tests/test_snowball_tail.py."""
    w = word

    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        cleanup = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            cleanup = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            cleanup = True
        if cleanup:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    rule = _longest_rule(w, _STEP2_CLASSIC)
    if rule is not None:
        suf, rep = rule
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    rule = _longest_rule(w, _STEP3)
    if rule is not None:
        suf, rep = rule
        stem = w[: len(w) - len(suf)]
        if _measure(stem) > 0:
            w = stem + rep

    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or stem[-1:] in ("s", "t")):
            w = stem

    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    if w.endswith("ll") and _measure(w[:-1]) > 1:
        w = w[:-1]

    return w


def porter_stem_tokens(tokens: list[str]) -> list[str]:
    """Chain-stage form (PorterStemFilter.incrementToken): stem each token.
    Position increments are untouched — stemming is 1:1."""
    return [porter_stem(t) for t in tokens]


def porter_stem_map(vocab):
    """(term, new_term) stem dictionary over a distinct-term frame — only
    terms the stemmer CHANGES (identity terms resolve via left-join +
    coalesce, keeping the map minimal).

    Scale shape: the Arrow-batched pandas pass runs over |V| distinct terms,
    not the token stream; ``build_index(term_map=porter_stem_map)`` joins it
    back broadcast-style so the posting build's partition clustering
    survives (no extra shuffle).  If the changed-vocabulary map ever
    outgrows broadcast (extreme multilingual vocab), the fallback is the
    same UDF applied map-side to the exploded term column — zero shuffle,
    more CPU, identical semantics."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(porter_stem)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
