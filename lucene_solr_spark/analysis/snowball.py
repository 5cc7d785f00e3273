"""Snowball English stemmer (Porter2) — the published algorithm from
snowballstem.org's "The English (Porter2) stemming algorithm", as shipped by
the reference via generated code (lucene/analysis/common/src/java/org/
tartarus/snowball/ext/EnglishStemmer.java, SnowballFilter.java,
SnowballPorterFilterFactory.java with language="English").

Golden-tested against the reference's full Snowball vocabulary
(TestSnowballVocabData.zip english/voc.txt -> output.txt, 29,417 pairs) in
tests/test_snowball.py.

Spark integration is the porter_stem_map shape: a vocabulary-level term map
(one Arrow batch over |V| distinct terms, broadcast-joined into the posting
build)."""

from __future__ import annotations

import pandas as pd

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli", "early": "earli",
    "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = [  # longest-match order; (suffix, replacement-or-callable)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
]

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
)


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS


def _short_syllable_at(w: str, i: int) -> bool:
    """A short syllable ENDING at index i (i = index of the non-vowel), per
    the spec: either (a) vowel followed by non-vowel other than w/x/Y,
    preceded by a non-vowel, or (b) a vowel at the beginning of the word
    followed by a non-vowel."""
    if i == 1:
        return w[0] in _VOWELS and w[1] not in _VOWELS
    if i >= 2:
        return (
            w[i - 1] in _VOWELS
            and w[i] not in _VOWELS
            and w[i] not in "wxY"
            and w[i - 2] not in _VOWELS
        )
    return False


def _is_short(w: str, r1: int) -> bool:
    """Word is short: ends in a short syllable AND R1 is the whole-word
    end."""
    return r1 >= len(w) and len(w) >= 2 and _short_syllable_at(w, len(w) - 1)


def _compute_r1(w: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    for i in range(1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            return i + 1
    return len(w)


def _compute_r2(w: str, r1: int) -> int:
    for i in range(r1 + 1, len(w)):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            return i + 1
    return len(w)


def porter2_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS1:
        return _EXCEPTIONS1[w]
    # (no re-check after the apostrophe strip: step 0 still removes a
    # trailing ' from what's left, e.g. 'a' -> a)
    # mark consonant y's
    if w[0] == "y":
        w = "Y" + w[1:]
    w = w[0] + "".join(
        "Y" if w[i] == "y" and w[i - 1] in _VOWELS else w[i]
        for i in range(1, len(w))
    )
    r1 = _compute_r1(w)
    r2 = _compute_r2(w, r1)

    # step 0: longest of ' 's 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if any(w[i] in _VOWELS for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w

    # step 1b
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in _VOWELS for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break

    # step 1c: y/Y -> i if preceded by a non-vowel which is not the first
    # letter of the word
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in _VOWELS
    ):
        w = w[:-1] + "i"

    # step 2 (in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and w[-3] in _LI_ENDING:
                w = w[:-2]

    # step 3 (in R1; ative needs R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    # step 4 (in R2)
    if w.endswith("ion"):
        if len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]
    else:
        for suf in _STEP4:
            if w.endswith(suf):
                if len(w) - len(suf) >= r2:
                    w = w[: -len(suf)]
                break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not (
            len(w) >= 2 and _short_syllable_at(w, len(w) - 2)
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")


def porter2_stem_map(vocab):
    """(term, new_term) Porter2 dictionary over a distinct-term frame —
    the porter_stem_map shape (analysis/stemmer.py)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(porter2_stem)

    return vocab.select(
        F.col("term"), _stem(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
