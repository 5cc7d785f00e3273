"""Language-specific token filters: Turkish/Irish case handling,
Turkish apostrophe strip, German orthographic normalization, and the
dictionary compound-word splitter.

Reference:
- lucene/analysis/common/src/java/org/apache/lucene/analysis/tr/
  TurkishLowerCaseFilter.java (:52-93 dotted/dotless I state machine,
  :100-112 combining-dot lookahead across other non-spacing marks)
- .../tr/ApostropheFilter.java (:45-58 truncate at the first ' or ’ —
  Turkish possessive/case suffixes after proper names)
- .../ga/IrishLowerCaseFilter.java (:41-65 n-/t- prothesis hyphenation
  before an upper vowel, then lowercase)
- .../de/GermanNormalizationFilter.java (:43-100 the German2-snowball
  folding FSM: ß→ss, umlauts→plain, ae/oe→a/o, ue→u unless after
  vowel/q)
- .../compound/DictionaryCompoundWordTokenFilter.java (:104-131 brute
  subword scan) + CompoundWordTokenFilterBase.java (:119-145 original
  token passes through, subwords append at the same position;
  minWordSize=5, minSubwordSize=2, maxSubwordSize=15 defaults)

All reference inline test cases pass in tests/test_filters_lang.py.

Scale shape: the word-level functions integrate index-side through the
vocabulary term-map / positioned-expansion machinery (one Arrow batch
over |V| distinct terms, broadcast-joined into the posting build) like
the stemmer families — the corpus never routes through Python.  The
compound splitter's Column form is a JVM-side higher-order transform.
"""

from __future__ import annotations

import unicodedata

_CAPITAL_I = "I"
_DOT_ABOVE = "̇"


def _simple_lower(ch: str) -> str:
    """Character.toLowerCase (the 1:1 UnicodeData mapping): İ maps to a
    bare 'i' (Python's str.lower would yield the two-char 'i̇')."""
    if ch == "İ":
        return "i"
    low = ch.lower()
    return low if len(low) == 1 else ch


def turkish_lower_case(s: str) -> str:
    """TurkishLowerCaseFilter: I→ı (dotless) unless a combining dot
    above follows (possibly behind other non-spacing marks), in which
    case I→i and the dot is removed; dots following a capital I are
    always consumed."""
    out: list[str] = []
    chars = list(s)
    n = len(chars)
    i = 0
    i_or_after = False
    while i < n:
        ch = chars[i]
        i_or_after = ch == _CAPITAL_I or (
            i_or_after and unicodedata.category(ch) == "Mn"
        )
        if i_or_after:
            if ch == _DOT_ABOVE:
                i += 1  # delete the dot (mimics composed lowercase)
                continue
            if ch == _CAPITAL_I:
                if _before_dot(chars, i + 1):
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False
                i += 1
                continue
        out.append(_simple_lower(ch))
        i += 1
    return "".join(out)


def _before_dot(chars: list[str], pos: int) -> bool:
    for j in range(pos, len(chars)):
        if unicodedata.category(chars[j]) != "Mn":
            return False
        if chars[j] == _DOT_ABOVE:
            return True
    return False


def apostrophe_strip(s: str) -> str:
    """ApostropheFilter: drop the first ' or ’ and everything after."""
    for i, ch in enumerate(s):
        if ch in "'’":
            return s[:i]
    return s


_GA_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")


def irish_lower_case(s: str) -> str:
    """IrishLowerCaseFilter: nAthair → n-athair (prothetic n-/t- before
    an upper vowel gets its hyphen restored), then lowercase."""
    if len(s) > 1 and s[0] in "nt" and s[1] in _GA_UPPER_VOWELS:
        return s[0] + "-" + "".join(_simple_lower(c) for c in s[1:])
    return "".join(_simple_lower(c) for c in s)


def german_normalize(s: str) -> str:
    """GermanNormalizationFilter FSM: N=ordinary, V=vowel blocks the
    umlaut state, U=umlaut state allows e-deletion after a/o/u."""
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for c in s:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue  # ae/oe/ue -> a/o/u (e deleted)
            out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


def dictionary_compound_decompose(
    word: str,
    dictionary: frozenset[str] | set[str],
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
) -> list[str]:
    """DictionaryCompoundWordTokenFilter over one token: the original
    token first (it always passes through), then every dictionary
    subword in scan order at the same position.  Dictionary lookup is
    case-insensitive (the factory builds its CharArraySet with
    ignoreCase=true), emitted subwords keep the original casing."""
    out = [word]
    if len(word) < min_word_size:
        return out
    lower = "".join(_simple_lower(c) for c in word)
    for i in range(0, len(word) - min_subword_size + 1):
        longest = None
        for j in range(min_subword_size, max_subword_size + 1):
            if i + j > len(word):
                break
            if lower[i : i + j] in dictionary:
                if only_longest_match:
                    longest = (i, j)
                else:
                    out.append(word[i : i + j])
        if only_longest_match and longest is not None:
            out.append(word[longest[0] : longest[0] + longest[1]])
    return out


def compound_filter_col(tokens, dictionary: tuple[str, ...], **kw):
    """Column form: expand each token to itself + subwords, flattened —
    one JVM-side pass for the common (default-parameter) case, matching
    dictionary_compound_decompose for words of ASCII/Latin casing."""
    from pyspark.sql import functions as F

    min_word = kw.get("min_word_size", 5)
    min_sub = kw.get("min_subword_size", 2)
    max_sub = kw.get("max_subword_size", 15)
    dict_arr = F.array(*[F.lit(d.lower()) for d in dictionary])

    def _subwords(t):
        # substr is 1-based; enumerate (start i, length j) pairs and keep
        # dictionary hits in scan order — the decompose() double loop
        return F.filter(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - min_sub + 1),
                    lambda i: F.transform(
                        F.sequence(F.lit(min_sub), F.lit(max_sub)),
                        lambda j: F.when(
                            (i + j - 1 <= F.length(t))
                            & F.array_contains(
                                dict_arr, F.lower(t).substr(i, j)
                            ),
                            t.substr(i, j),
                        ),
                    ),
                )
            ),
            lambda x: x.isNotNull(),
        )

    def expand(t):
        return F.when(
            F.length(t) >= min_word,
            F.concat(F.array(t), _subwords(t)),
        ).otherwise(F.array(t))

    return F.flatten(F.transform(tokens, expand))
