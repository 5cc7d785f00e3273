"""CJK bigram analysis — the CJKAnalyzer / CJKBigramFilter analog.

Reference semantics (lucene/analysis/common/src/java/org/apache/lucene/
analysis/cjk/CJKBigramFilter.java:48-363, CJKAnalyzer.java): the
StandardTokenizer emits Han and Hiragana one char per token, Katakana and
Hangul as runs; CJKBigramFilter buffers codepoints from consecutive
OFFSET-ALIGNED tokens of the flagged scripts and emits overlapping bigrams
(<DOUBLE>); a lone CJK codepoint that cannot pair (interrupted by non-CJK
or a gap on both sides) is emitted as a unigram (<SINGLE>); non-CJK tokens
pass through untouched.

Offset alignment at the token level is exactly TEXT CONTIGUITY, so this
module re-expresses the filter Spark-first: one `regexp_extract_all` pass
whose CJK alternative captures a *contiguous run* across all four scripts
(mixed-script runs bigram together, as the reference buffer does), then a
JVM-side higher-order expansion turns each run of n >= 2 codepoints into
its n-1 overlapping bigrams and keeps length-1 runs as unigrams.  No
Python in the loop; the identical expansion is expressible in DuckDB list
comprehensions for the correctness oracle (oracle/sqlgen.py).

Validated against the reference's TestCJKAnalyzer/TestCJKBigramFilter
token streams (tests/test_cjk.py), including the mixed-script,
interrupted-run, and supplementary-plane (surrogate) cases.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analyzer import (
    _AL_RUN,
    _ALETTER,
    _HAN,
    _NUMCLS,
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
)

# The four bigram-able script classes (StandardTokenizer types
# <IDEOGRAPHIC>, <HIRAGANA>, <KATAKANA>, <HANGUL>) as ONE run class —
# CJKBigramFilter's buffer accepts any flagged type as long as offsets
# align, so contiguous mixed-script text bigrams across scripts.
_CJK_CLASS = (
    f"{_HAN}"
    "ぁ-ゟ\U0001B001"              # Hiragana + archaic
    "゠-ヿㇰ-ㇿｦ-ﾝ\U0001B000"  # Katakana + phonetic ext + halfwidth
    "가-힣ᄀ-ᇿㄱ-ㆎꥠ-ꥼힰ-ퟻ"    # Hangul syllables + jamo
)

# TOKEN_PATTERN with the per-script CJK alternatives replaced by the run
# class; Thai/Lao/word alternatives unchanged (analyzer.py TOKEN_PATTERN).
CJK_TOKEN_PATTERN = (
    f"[{_CJK_CLASS}]+"
    "|[ก-๛]+"
    "|[ກ-ໝ]+"
    f"|(?:{_AL_RUN}(?:['.’]{_AL_RUN})*"
    f"|[{_NUMCLS}]+(?:[.,'][{_NUMCLS}]+)*"
    f"|[{_ALETTER}{_NUMCLS}_])+"
)

_CJK_PROBE = f"^[{_CJK_CLASS}]"
_CJK_RUN_RE = re.compile(f"[{_CJK_CLASS}]+")


def cjk_bigram_tokens_expr(text: Column, output_unigrams: bool = False) -> Column:
    """Full CJKAnalyzer chain as one JVM-side expression:
    tokenize (CJK runs) -> expand runs to bigrams -> lowercase ->
    length cap + English stop removal.  array<string> out.

    ``output_unigrams=True`` is the CJKBigramFilterFactory
    outputUnigrams option: every CJK codepoint additionally emits its
    unigram (A, AB, B, BC, C interleave in the reference; as a term
    multiset, unigrams + bigrams).
    """
    raw = F.regexp_extract_all(text, F.lit(CJK_TOKEN_PATTERN), 0)

    def expand(t: Column) -> Column:
        n = F.length(t)
        bigrams = F.transform(
            F.sequence(F.lit(1), n - 1), lambda i: F.substring(t, i, 2)
        )
        if output_unigrams:
            unigrams = F.transform(
                F.sequence(F.lit(1), n), lambda i: F.substring(t, i, 1)
            )
            cjk_out = F.when(n >= 2, F.concat(unigrams, bigrams)).otherwise(
                F.array(t)
            )
        else:
            cjk_out = F.when(n >= 2, bigrams).otherwise(F.array(t))
        return F.when(t.rlike(_CJK_PROBE), cjk_out).otherwise(F.array(t))

    toks = F.flatten(F.transform(raw, expand))
    toks = F.transform(toks, F.lower)
    return F.filter(
        toks,
        lambda t: (F.length(t) <= MAX_TOKEN_LENGTH)
        & ~t.isin(*ENGLISH_STOP_WORDS),
    )


def cjk_bigram_tokens(text: str, output_unigrams: bool = False) -> list[str]:
    """Pure-Python reference of the same chain (pre-lowercase/stop), for
    differential tests against the reference's expected token streams."""
    out: list[str] = []
    for m in re.finditer(CJK_TOKEN_PATTERN, text):
        t = m.group(0)
        if _CJK_RUN_RE.fullmatch(t):
            if len(t) >= 2:
                if output_unigrams:
                    out.extend(t[i] for i in range(len(t)))
                out.extend(t[i : i + 2] for i in range(len(t) - 1))
            else:
                out.append(t)
        else:
            out.append(t)
    return out


def cjk_positioned_tokens_expr(text: Column) -> Column:
    """array<struct<pos:int, term:string>> for the CJK chain, with Lucene
    position semantics: positions are ordinals over the post-bigram stream
    BEFORE stop/length removal (CJKBigramFilter emits every gram with
    posInc 1; StopFilter then gaps), matching
    analyzer.positioned_tokens_expr's discipline.  Feed to
    build_index(positioned_tokens_col=..., build_positions=True)."""
    raw = F.regexp_extract_all(text, F.lit(CJK_TOKEN_PATTERN), 0)

    def expand(t: Column) -> Column:
        n = F.length(t)
        bigrams = F.transform(
            F.sequence(F.lit(1), n - 1), lambda i: F.substring(t, i, 2)
        )
        cjk_out = F.when(n >= 2, bigrams).otherwise(F.array(t))
        return F.when(t.rlike(_CJK_PROBE), cjk_out).otherwise(F.array(t))

    toks = F.flatten(F.transform(raw, expand))
    pos_structs = F.transform(
        toks, lambda t, i: F.struct(i.alias("pos"), F.lower(t).alias("term"))
    )
    return F.filter(
        pos_structs,
        lambda s: (F.length(s["term"]) <= MAX_TOKEN_LENGTH)
        & ~s["term"].isin(*ENGLISH_STOP_WORDS),
    )


# ---------------------------------------------------------------------------
# Deterministic CJK corpus synthesis (no external data): gloss each word of
# the driver testdata vocabulary with a hanzi compound and concatenate
# WITHOUT separators — contiguous runs, so bigrams cross word boundaries
# exactly as CJKBigramFilter does over running Chinese text.  Both engines
# compute the same synthesis (Spark map literal / SQL CASE), so the
# correctness oracle grades the full chain end-to-end.
# ---------------------------------------------------------------------------

CJK_GLOSS = {
    "a": "的", "agg": "聚合", "batch": "批次", "big": "巨大",
    "column": "列欄", "customer": "顧客", "data": "資料", "dup": "重複",
    "fast": "快速", "filter": "過濾", "group": "分組", "hash": "雜湊",
    "join": "連接", "key": "鍵值", "line": "行線", "merge": "合併",
    "order": "訂單", "part": "零件", "query": "查詢", "row": "橫列",
    "scan": "掃描", "slow": "緩慢", "small": "細小", "sort": "排序",
    "spark": "火花", "stream": "串流", "table": "表格", "the": "此",
    "value": "數值", "vector": "向量", "window": "視窗",
}


def cjk_gloss_text_expr(text: Column) -> Column:
    """Deterministic CJK text: split on spaces, gloss each word, concatenate
    contiguously.  All JVM-side (map literal + higher-order transform)."""
    m = F.create_map(
        *[F.lit(x) for kv in sorted(CJK_GLOSS.items()) for x in kv]
    )
    words = F.split(text, " ")
    return F.concat_ws(
        "", F.transform(words, lambda w: F.coalesce(m[w], w))
    )


def cjk_gloss_doc_source_sql() -> str:
    """The same synthesis as DuckDB SQL, for the oracle prelude doc source."""
    cases = " ".join(
        f"WHEN '{w}' THEN '{g}'" for w, g in sorted(CJK_GLOSS.items())
    )
    return (
        "SELECT doc_id AS docid, array_to_string(list_transform("
        f"string_split(text, ' '), w -> CASE w {cases} ELSE w END), '') AS text "
        "FROM documents"
    )


def cjk_oracle_tokens_sql(text_sql: str) -> str:
    """DuckDB rendering of the same expansion (list comprehension over the
    same pattern), for oracle preludes.  Returns a list<varchar> SQL expr."""
    pat = CJK_TOKEN_PATTERN.replace("'", "''")
    cjk_probe = _CJK_PROBE.replace("'", "''")
    return (
        "flatten(list_transform("
        f"regexp_extract_all({text_sql}, '{pat}'), "
        f"t -> CASE WHEN regexp_matches(t, '{cjk_probe}') AND length(t) >= 2 "
        "THEN [substring(t, i, 2) FOR i IN range(1, length(t))] "
        "ELSE [t] END))"
    )
