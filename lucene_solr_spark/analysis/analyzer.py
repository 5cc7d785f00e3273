"""StandardAnalyzer-equivalent chain, Spark-first.

Reference semantics (public Apache Lucene 4.10.5, studied at /root/reference):

- ``StandardTokenizer`` — UAX#29 word segmentation
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java:61-91);
  tokens longer than ``maxTokenLength=255`` are *skipped*, bumping the position
  counter (StandardTokenizer.java:204-216, StandardAnalyzer.java:55).
- ``StandardFilter`` — no-op for Lucene >= 3.1 (StandardFilter.java:55-60).
- ``LowerCaseFilter`` — Unicode lowercase (analysis/core/LowerCaseFilter.java).
- ``StopFilter`` — removes the 33-word English stop set and bumps position
  increments (analysis/core/StopFilter.java; set in StopAnalyzer.java:47-59).

Spark-first design
------------------
Tokenization is a *single regex* engineered to (a) reproduce the UAX#29
(Unicode 6.3) word-break rules on the Latin/digit/CJK subset and (b) behave
identically under three regex engines with leftmost-first alternation and NO
lookaround: Java ``java.util.regex`` (Spark's JVM-side ``regexp_extract_all``
— the hot path, whole-stage-codegen friendly), Python ``re`` (the pandas/Arrow
UDF path and the pure-Python test oracle), and RE2 (DuckDB's
``regexp_extract_all`` — the driver's correctness oracle).  That single shared
pattern is what makes Spark-vs-oracle comparisons byte-identical by
construction.

UAX#29 mapping encoded in the pattern (Unicode 6.3 word-break classes,
restricted to the corpus alphabet):
- ALetter runs joined across a single MidLetter/MidNumLet/Single_Quote
  (``'``, ``.``, U+2019) when a letter follows: ``can't``, ``a.b.c``.
- Numeric runs joined across a single MidNum/MidNumLet/Single_Quote
  (``.``, ``,``, ``'``) when a digit follows: ``3.14``, ``1,000``.
- ExtendNumLet ``_`` glues adjacent runs: ``foo_bar``, ``a_1``.
- Letter/digit runs glue directly (WB9/WB10): ``abc123``.
- CJK ideographs tokenize one char per token (Lucene type <IDEOGRAPHIC>).
- Everything else breaks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# One pattern, three engines (java.util.regex / Python re / RE2). No
# lookaround, no backreferences, no \p classes (Python re lacks them) —
# explicit char ranges only; alternation order matters and is identical
# (leftmost-first) in all three engines.
#
# CJK per StandardTokenizer token types (StandardTokenizer.java:61-91):
# Han ideographs and Hiragana emit ONE char per token (<IDEOGRAPHIC>,
# <HIRAGANA>); Katakana forms runs (WB13, <KATAKANA>); Hangul is
# ALetter-class runs (<HANGUL>).
#
# Supplementary-plane + multi-script coverage (round 3, closing the JFlex
# grammar gap): the ALetter class spans Latin (incl. supplements/IPA),
# Greek (+polytonic), Cyrillic, Armenian, Hebrew, Arabic, Devanagari and
# the astral alphabets (Gothic/Deseret/Shavian); Han covers Ext A and the
# astral Ext B-D + compatibility supplements; Extend (combining marks —
# UAX#29 WB4) joins mid-word so pointed Hebrew, vowelized Arabic and
# Devanagari matras never split words.  Every character in these classes is
# MACHINE-VALIDATED for identical lowercasing across Python / DuckDB /
# Spark (tests/test_uax29_supplement.py regenerates the ranges and fails on
# drift); the two engine-divergent characters — U+0130 Turkish İ
# (length-changing, DuckDB disagrees) and U+03A3 capital sigma (contextual
# final-sigma lowering, DuckDB lacks it) — are excluded from the classes so
# they break tokens instead of corrupting hashes.  Emoji and other
# unclassified pictographs are DROPPED, exactly like the 4.10 grammar.
_ALETTER = (
    "A-Za-z"
    # machine-generated, cross-engine-lowercase-validated ranges (see
    # tests/test_uax29_supplement.py, which regenerates and diffs them)
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u012F\u0131-\u02AF\u0370-\u0374\u0376-\u0377\u037A-\u037D\u037F\u0386\u0388-\u038A\u038C\u038E-\u03A1\u03A4-\u03F5\u03F7-\u0481\u048A-\u052F\u0531-\u0556\u0559\u0560-\u0588\u05D0-\u05EA\u0620-\u064A\u0671-\u06D3\u0750-\u077F\u0904-\u0939\u0958-\u0961\u0971-\u0977\u1F00-\u1F15\u1F18-\u1F1D\u1F20-\u1F45\u1F48-\u1F4D\u1F50-\u1F57\u1F59\u1F5B\u1F5D\u1F5F-\u1F7D\u1F80-\u1FB4\u1FB6-\u1FBC\u1FBE\u1FC2-\u1FC4\u1FC6-\u1FCC\u1FD0-\u1FD3\u1FD6-\u1FDB\u1FE0-\u1FEC\u1FF2-\u1FF4\u1FF6-\u1FFC\uFF21-\uFF3A\uFF41-\uFF5A\U00010330-\U00010340\U00010342-\U00010349\U00010400-\U0001047F"
)
_EXTEND = (
    "\u0300-\u036F\u0483-\u0489\u0591-\u05BD\u05BF\u05C1-\u05C2\u05C4-\u05C5\u05C7\u064B-\u065F\u0670\u06D6-\u06DC\u06DF-\u06E4\u06E7-\u06E8\u06EA-\u06ED\u0900-\u0903\u093A-\u093C\u093E-\u094F\u0951-\u0957\u0962-\u0963"
)
_NUMCLS = "0-9\u0660-\u0669\u06F0-\u06F9\u0966-\u096F\uFF10-\uFF19"
_AL_RUN = f"[{_ALETTER}][{_ALETTER}{_EXTEND}]*"
_HAN = (
    "一-鿿㐀-䶵豈-龎"
    "\U00020000-\U0002A6D6\U0002A700-\U0002B734\U0002B740-\U0002B81D"
    "\U0002F800-\U0002FA1D"
)
TOKEN_PATTERN = (
    f"[{_HAN}]"      # Han (+ext A-D, compat): one char per token
    "|[ぁ-ゟ\U0001B001]"                 # Hiragana: one char per token
    "|[゠-ヿㇰ-ㇿｦ-ﾝ\U0001B000]+"  # Katakana (+phonetic ext, halfwidth): runs
    "|[가-힣ᄀ-ᇿㄱ-ㆎꥠ-ꥼힰ-ퟻ]+"  # Hangul syllables + jamo
    "|[ก-๛]+"      # Thai U+0E01-U+0E5B: <SOUTHEAST_ASIAN> runs
    "|[ກ-ໝ]+"      # Lao U+0E81-U+0EDD: <SOUTHEAST_ASIAN> runs
    f"|(?:{_AL_RUN}(?:['.’]{_AL_RUN})*"
    f"|[{_NUMCLS}]+(?:[.,'][{_NUMCLS}]+)*"
    f"|[{_ALETTER}{_NUMCLS}_])+"
)

_PY_RE = re.compile(TOKEN_PATTERN)

# UAX29URLEmailTokenizer analog (lucene/analysis/common/src/java/org/apache/
# lucene/analysis/standard/UAX29URLEmailTokenizer.java): StandardTokenizer's
# rules plus <URL> and <EMAIL> token types kept as SINGLE tokens.  The
# reference's JFlex grammar (UAX29URLEmailTokenizerImpl.jflex) covers full
# RFC-3986/5321; this is a documented subset — scheme-required URLs
# (http/https/ftp, optional port/path/query/fragment) and local@domain.tld
# emails — in the same tri-engine dialect (no lookaround, leftmost-first
# alternation, so the URL/EMAIL branches MUST precede the word branches).
URL_EMAIL_TOKEN_PATTERN = (
    "(?:[Hh][Tt][Tt][Pp][Ss]?|[Ff][Tt][Pp])://"
    "[A-Za-z0-9.-]+(?::[0-9]+)?"
    "(?:/[A-Za-z0-9._~%/?#@!$&+,;=()-]*)?"
    "|[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+"
    "|" + TOKEN_PATTERN
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# StopAnalyzer.ENGLISH_STOP_WORDS_SET (StopAnalyzer.java:47-59) — 33 words.
ENGLISH_STOP_WORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with",
)
_STOP_SET = frozenset(ENGLISH_STOP_WORDS)


def sql_quoted_pattern() -> str:
    """TOKEN_PATTERN as a single-quoted SQL string literal (for DuckDB/RE2)."""
    return "'" + TOKEN_PATTERN.replace("'", "''") + "'"


def sql_quote_pattern(pattern: str) -> str:
    """Any pattern as a single-quoted SQL string literal (for DuckDB/RE2)."""
    return "'" + pattern.replace("'", "''") + "'"


def sql_stopword_list() -> str:
    """The stop set as a SQL IN-list literal."""
    return "(" + ", ".join(f"'{w}'" for w in ENGLISH_STOP_WORDS) + ")"


# ---------------------------------------------------------------------------
# JVM-side path (preferred at scale: stays inside whole-stage codegen)
# ---------------------------------------------------------------------------

# Fast path for ASCII-only rows.  On input whose every char is < U+00C0 the
# full pattern degenerates to exactly this (the multi-script classes contain
# no code point below 0xC0 — the generator starts at À — and the CJK/astral
# branches can never match), so dispatching per row is a pure optimization:
# java.util.regex pays ~50 failed range checks per separator char against
# the big classes, which measured ~4x slower on an all-ASCII corpus.  RE2
# (the DuckDB oracle) compiles the full pattern to a DFA and doesn't care,
# so the oracle keeps the single full pattern; this dispatch is Spark-only
# and semantics-free.
_ASCII_TOKEN_PATTERN = (
    "(?:[A-Za-z]+(?:['.][A-Za-z]+)*"
    "|[0-9]+(?:[.,'][0-9]+)*"
    "|[0-9A-Za-z_])+"
)
_NON_ASCII_PROBE = "[^\\x00-\\xBF]"  # complement class also hits astral


def raw_tokens_expr(text: Column) -> Column:
    """Raw tokenizer output (pre-filters), as array<string>.

    Token *positions* are array indices here — Lucene's position counter
    counts every tokenizer-emitted token, including ones later dropped by the
    length cap (StandardTokenizer.java skippedPositions) or StopFilter.
    """
    return F.when(
        text.rlike(_NON_ASCII_PROBE),
        F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0),
    ).otherwise(F.regexp_extract_all(text, F.lit(_ASCII_TOKEN_PATTERN), 0))


def tokens_expr(text: Column) -> Column:
    """Full analyzer chain output: array<string> of final index terms.

    regexp_extract_all -> drop >255-char tokens -> lowercase -> drop stopwords.
    All JVM-side built-ins; no Python in the loop.
    """
    # ONE lower pass + ONE fused filter pass (each higher-order array op
    # allocates a fresh array — fusing length+stop halves the allocations).
    # length(lower(t)) == length(t) for every token the pattern can emit:
    # its alphabet (ASCII + caseless CJK/Thai/Lao) has no length-changing
    # case mappings, so filtering on post-lower length is exact.
    toks = F.transform(raw_tokens_expr(text), F.lower)
    # isin over >10 literals compiles to Catalyst InSet (hash-set probe) —
    # measurably cheaper than array_contains' linear scan at ~1e9 tokens
    return F.filter(
        toks,
        lambda t: (F.length(t) <= MAX_TOKEN_LENGTH)
        & ~t.isin(*ENGLISH_STOP_WORDS),
    )


def positioned_tokens_expr(text: Column) -> Column:
    """array<struct<pos:int, term:string>> with Lucene position semantics.

    Positions are assigned over the raw tokenizer stream, THEN stopwords and
    over-long tokens are removed — surviving tokens keep gapped positions,
    exactly like StopFilter/StandardTokenizer position increments.
    """
    # Two array passes total (struct-build, fused filter); the raw length
    # equals the post-lower length for the pattern's alphabet (see
    # tokens_expr), so no _rawlen field and no struct-stripping third pass.
    pos_structs = F.transform(
        raw_tokens_expr(text),
        lambda t, i: F.struct(i.alias("pos"), F.lower(t).alias("term")),
    )
    return F.filter(
        pos_structs,
        lambda s: (F.length(s["term"]) <= MAX_TOKEN_LENGTH)
        & ~s["term"].isin(*ENGLISH_STOP_WORDS),
    )


POSITION_INCREMENT_GAP = 100  # Solr text-field default (schema.xml)


def multivalued_tokens_expr(values: Column) -> Column:
    """Analyzer chain over a multiValued field (array<string>): each value
    analyzes independently; the flat term array feeds dl/inversion.  dl is
    the total EMITTED token count across values (invertState.length in
    DefaultIndexingChain — gaps never contribute to length/norms)."""
    return F.flatten(
        F.transform(values, lambda v: F.coalesce(tokens_expr(v), F.array()))
    )


def multivalued_positioned_tokens_expr(
    values: Column, gap: int = POSITION_INCREMENT_GAP
) -> Column:
    """Positioned analyzer chain over a multiValued field with Lucene's
    positionIncrementGap semantics (DefaultIndexingChain.java:668-699: after
    each value ``stream.end()`` adds the trailing skipped increments, then
    the gap is added per extra instance).  With this module's raw-index
    position convention (every raw token advances the counter by one,
    emitted or skipped) that folds to one uniform rule:

        offset_0 = 0;  offset_{j+1} = offset_j + raw_token_count_j + gap

    and every emitted token's absolute position = offset_j + raw index —
    covering trailing-stopword values and empty values exactly.  One
    JVM-side aggregate over the (few) values; no Python, no shuffle."""
    empty = F.array().cast("array<struct<pos:int,term:string>>")
    return F.aggregate(
        values,
        F.struct(F.lit(0).alias("off"), empty.alias("toks")),
        lambda acc, v: F.struct(
            (
                acc["off"]
                + F.size(F.coalesce(raw_tokens_expr(v), F.array()))
                + F.lit(gap)
            ).alias("off"),
            F.concat(
                acc["toks"],
                F.transform(
                    F.coalesce(positioned_tokens_expr(v), empty),
                    lambda s: F.struct(
                        (s["pos"] + acc["off"]).alias("pos"),
                        s["term"].alias("term"),
                    ),
                ),
            ).alias("toks"),
        ),
        lambda acc: acc["toks"],
    )


def analyze_multivalued_positions(
    values: list[str | None] | None, gap: int = POSITION_INCREMENT_GAP
) -> list[tuple[int, str]]:
    """Pure-Python oracle for the multiValued positioned chain."""
    out: list[tuple[int, str]] = []
    off = 0
    for v in values or []:
        for p, t in analyze_text_positions(v):
            out.append((off + p, t))
        raw = [t for t in _PY_RE.findall(v)] if v else []
        off += len([t for t in raw if t]) + gap
    return out


# ---------------------------------------------------------------------------
# Python path (pandas/Arrow UDFs + pure-Python oracle for golden tests)
# ---------------------------------------------------------------------------

def analyze_text(text: str | None) -> list[str]:
    """Pure-Python analyzer (oracle for golden tests; identical semantics)."""
    if not text:
        return []
    out = []
    for t in _PY_RE.findall(text):
        if not t or len(t) > MAX_TOKEN_LENGTH:
            continue
        t = t.lower()
        if t not in _STOP_SET:
            out.append(t)
    return out


def analyze_text_positions(text: str | None) -> list[tuple[int, str]]:
    """Pure-Python positioned analyzer: [(pos, term)] with gapped positions."""
    if not text:
        return []
    out = []
    pos = 0
    for t in _PY_RE.findall(text):
        if not t:
            continue
        if len(t) > MAX_TOKEN_LENGTH:
            pos += 1  # skipped token still advances position (skippedPositions)
            continue
        low = t.lower()
        if low not in _STOP_SET:
            out.append((pos, low))
        pos += 1
    return out


def analyze_series(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) analyzer over a pandas Series of strings.

    Used from ``mapInPandas``/``pandas_udf`` contexts; semantics identical to
    ``tokens_expr`` (property-tested against it).
    """
    return texts.map(analyze_text)


@lru_cache(maxsize=32)
def _compiled_pattern(pattern: str) -> re.Pattern:
    return re.compile(pattern)


@dataclass(frozen=True)
class StandardAnalyzer:
    """Pluggable analyzer descriptor (TokenFilterFactory-registry analog,
    lucene/analysis/common/.../util/TokenFilterFactory.java). v0 ships the
    standard chain; custom chains can override pattern/stopwords/cap."""

    pattern: str = TOKEN_PATTERN
    stopwords: tuple[str, ...] = ENGLISH_STOP_WORDS
    max_token_length: int = MAX_TOKEN_LENGTH
    lowercase: bool = True

    def tokens_col(self, text: Column) -> Column:
        toks = F.regexp_extract_all(text, F.lit(self.pattern), 0)
        toks = F.filter(toks, lambda t: F.length(t) <= self.max_token_length)
        if self.lowercase:
            toks = F.transform(toks, F.lower)
        if self.stopwords:
            toks = F.filter(toks, lambda t: ~t.isin(*self.stopwords))
        return toks

    def analyze(self, text: str | None) -> list[str]:
        if not text:
            return []
        rx = _compiled_pattern(self.pattern)
        stop = frozenset(self.stopwords)
        out = []
        for t in rx.findall(text):
            if not t or len(t) > self.max_token_length:
                continue
            if self.lowercase:
                t = t.lower()
            if t not in stop:
                out.append(t)
        return out


def uax29_url_email_analyzer() -> StandardAnalyzer:
    """The UAX29URLEmailTokenizer-based chain: URL/EMAIL single tokens plus
    the standard rules, then the usual lowercase/length/stop filters."""
    return StandardAnalyzer(pattern=URL_EMAIL_TOKEN_PATTERN)
