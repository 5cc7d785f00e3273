"""Snowball Irish stemmer — the published algorithm from
snowballstem.org (irish.sbl, Jim O'Regan), shipped by the reference as
generated code (lucene/analysis/common/src/java/org/tartarus/snowball/
ext/IrishStemmer.java, selected via SnowballPorterFilterFactory
language="Irish").

Golden-tested in tests/test_snowball_ext_tail.py against 2,955 pairs
produced by the reference's own compiled IrishStemmer
(tools/gen_snowball_tail_goldens.py).

Structure:
1. initial_morph (forward, at word start): strip eclipsis/lenition
   prosthetics — h-/n-/t- drop, d'fh -> f, bhf -> f, mb -> b ... and
   the lenited Xh digraphs restore the radical (bh -> b, ch -> c, ...).
2. mark_regions on the MUTATED word: pV after the first vowel, p1/p2
   the standard vowel+non-vowel Snowball regions (vowels aeiouáéíóú).
3. Three independent backward `do` steps — noun_sfx (R1/R2 gated),
   deriv (R2 gate or recode to the radical), verb_sfx (RV/R1 gated) —
   each removing its longest matching suffix; a failed region gate
   means the step is a no-op (Snowball among actions do not fall back
   to shorter entries).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóú")

# initial_morph (IrishStemmer.java a_0), longest-first; value = the
# replacement for the matched prefix ("" = delete).
_PREFIXES = (
    ("d'fh", "f"),
    ("bhf", "f"),
    ("b'", ""),
    ("bh", "b"),
    ("bp", "p"),
    ("ch", "c"),
    ("d'", ""),
    ("dh", "d"),
    ("dt", "t"),
    ("fh", "f"),
    ("gc", "c"),
    ("gh", "g"),
    ("h-", ""),
    ("m'", ""),
    ("mb", "b"),
    ("mh", "m"),
    ("n-", ""),
    ("nd", "d"),
    ("ng", "g"),
    ("ph", "p"),
    ("sh", "s"),
    ("t-", ""),
    ("th", "t"),
    ("ts", "s"),
)

# suffix tables (a_1..a_3), longest-first: (suffix, gate, replacement)
# gate: "R1" / "R2" / "RV" region condition on the suffix start.
_NOUN_SFX = (
    ("aíochta", "R1", ""),
    ("íochta", "R1", ""),
    ("aíocht", "R1", ""),
    ("íocht", "R1", ""),
    ("aire", "R2", ""),
    ("eabh", "R1", ""),
    ("aibh", "R1", ""),
    ("eamh", "R1", ""),
    ("aimh", "R1", ""),
    ("airí", "R2", ""),
    ("ire", "R2", ""),
    ("abh", "R1", ""),
    ("ibh", "R1", ""),
    ("amh", "R1", ""),
    ("imh", "R1", ""),
    ("irí", "R2", ""),
)

_DERIV = (
    ("grafaíochtaí", None, "graf"),
    ("grafaíochta", None, "graf"),
    ("grafaíocht", None, "graf"),
    ("grafaíoch", None, "graf"),
    ("arcachtaí", None, "arc"),
    ("óideacha", None, "óid"),
    ("arcachta", None, "arc"),
    ("eachtúil", "R2", ""),
    ("patacha", None, "paite"),
    ("óideach", None, "óid"),
    ("gineach", None, "gin"),
    ("pataigh", None, "paite"),
    ("achtúil", "R2", ""),
    ("arcacht", None, "arc"),
    ("eachta", "R2", ""),
    ("patach", None, "paite"),
    ("óidigh", None, "óid"),
    ("gineas", None, "gin"),
    ("achta", "R2", ""),
    ("paite", None, "paite"),
    ("ginis", None, "gin"),
    ("eacht", "R2", ""),
    ("each", "R2", ""),
    ("acht", "R2", ""),
    ("ach", "R2", ""),
)

_VERB_SFX = (
    ("aimid", "RV", ""),
    ("aímid", "RV", ""),
    ("faidh", "RV", ""),
    ("imid", "RV", ""),
    ("ímid", "RV", ""),
    ("eadh", "R1", ""),
    ("fidh", "RV", ""),
    ("tear", "R1", ""),
    ("adh", "R1", ""),
    ("áil", "R1", ""),
    ("ain", "R1", ""),
    ("tar", "R1", ""),
)


def _mark_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pV = p1 = p2 = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i < n:
        pV = i + 1
    # p1: after the first non-vowel that follows a vowel
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
        i += 1
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        if i < n:
            p2 = i + 1
    return pV, p1, p2


def _step(w: str, table, pV: int, p1: int, p2: int) -> str:
    for suf, gate, rep in table:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if gate == "R1" and start < p1:
                return w
            if gate == "R2" and start < p2:
                return w
            if gate == "RV" and start < pV:
                return w
            return w[:start] + rep
    return w


def irish_stem(word: str) -> str:
    """Stem one (lowercased) word with the Snowball Irish algorithm."""
    w = word
    for pre, rep in _PREFIXES:
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    pV, p1, p2 = _mark_regions(w)
    w = _step(w, _NOUN_SFX, pV, p1, p2)
    w = _step(w, _DERIV, pV, p1, p2)
    w = _step(w, _VERB_SFX, pV, p1, p2)
    return w
