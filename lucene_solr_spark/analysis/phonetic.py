"""Phonetic token encoding — Soundex, the PhoneticFilter's default-family
encoder.

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java:36-100 (wraps a commons-codec Encoder; with
``inject=false`` every token is REPLACED by its code, with ``inject=true``
codes are added as same-position synonyms) and PhoneticFilterFactory.java
(encoder registry: Soundex/RefinedSoundex/Metaphone/...).  The encoder
itself lives in commons-codec (external to the reference tree); this is the
classic American Soundex as commons-codec implements it:

  - first letter kept verbatim; remaining letters map through
    A..Z -> "01230120022455012623010202" (vowels+HWY -> 0)
  - adjacent letters with the same code collapse to one
  - H/W do not separate same-code letters (the 1991 US archive rule:
    a consonant after H/W whose code equals the consonant two back — or
    whose two-back is itself H/W — is dropped without resetting state)
  - vowels DO separate (same code on both sides of a vowel is coded twice)
  - zeros drop, result padded/truncated to 4 chars

The engine applies it as a vocabulary-level term dictionary
(``soundex_map``), the same scale shape as the Porter stem map
(analysis/stemmer.porter_stem_map): the Arrow-batched pandas pass runs over
|V| distinct terms, not the token stream, and broadcast-joins back into the
posting build with zero extra shuffle.
"""

from __future__ import annotations

import pandas as pd

_MAP = "01230120022455012623010202"  # A..Z


def _code(ch: str) -> str:
    return _MAP[ord(ch) - 65]


def soundex(word: str) -> str:
    """American Soundex of ``word`` (commons-codec Soundex semantics,
    US_ENGLISH mapping + H/W rule).  Non-letters are stripped first; empty
    input encodes to the empty string."""
    s = [c for c in word.upper() if "A" <= c <= "Z"]
    if not s:
        return ""
    out = [s[0]]
    last = _code(s[0])
    i = 1
    while i < len(s) and len(out) < 4:
        mapped: str | None = _code(s[i])
        # H/W rule (commons-codec Soundex.getMappingCode): a coded letter
        # right after H/W is dropped when the letter before that H/W has
        # the same code, or is itself H/W; state (``last``) is untouched
        if i > 1 and mapped != "0" and s[i - 1] in "HW":
            pre = s[i - 2]
            if _code(pre) == mapped or pre in "HW":
                mapped = None
        if mapped is not None:
            if mapped != "0" and mapped != last:
                out.append(mapped)
            last = mapped
        i += 1
    return "".join(out).ljust(4, "0")


def soundex_tokens(tokens: list[str]) -> list[str]:
    """Chain-stage form (PhoneticFilter inject=false): encode each token.
    1:1, position increments untouched."""
    return [soundex(t) for t in tokens]


def soundex_map(vocab):
    """(term, code) dictionary over a distinct-term frame — CHANGED terms
    only, for ``build_index(term_map=soundex_map)``.  Same broadcast
    left-join application and scale shape as porter_stem_map."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(soundex)

    return vocab.select(
        F.col("term"), _enc(F.col("term")).alias("new_term")
    ).where(F.col("new_term") != F.col("term"))
