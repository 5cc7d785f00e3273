"""Text analysis: language-ID, quality scoring, token stats, fingerprinting.

All pure JVM-side expressions (whole-stage codegen; no Python in the loop),
each reproducible in ANSI SQL for the DuckDB oracle.  These are the
corpus-hygiene passes a training-data pipeline runs over every document —
at 100 TB they are embarrassingly parallel map-side scans with one final
aggregation at most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    raw_tokens_expr,
    tokens_expr,
)
from lucene_solr_spark.hashing import hash64_col

# Marker-word profiles for the n-gram/lexicon language heuristic.  Tiny by
# design: the point is the distributed shape (per-doc argmax over per-language
# evidence counts), not lexicographic completeness.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with", "for"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "es", "una", "para"),
}


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(docid, pred_lang, evidence): lexicon-marker language heuristic.

    CJK short-circuit (any ideograph -> zh), else argmax of marker-token
    counts over the RAW lowercase token stream (ties broken by language code
    asc; no evidence at all -> 'und').
    """
    toks = F.transform(
        F.coalesce(raw_tokens_expr(F.col(text_col)), F.array()), F.lower
    )
    d = df.select(F.col(id_col).alias("docid"), toks.alias("_t"),
                  F.col(text_col).alias("_text"))
    langs = sorted(LANG_MARKERS)
    counts = [
        F.size(F.filter("_t", lambda t: t.isin(*LANG_MARKERS[lg]))).alias(f"c_{lg}")
        for lg in langs
    ]
    d = d.select("docid", "_text", *counts)
    best = F.greatest(*[F.col(f"c_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    # ties by language code asc: first language reaching the max wins
    for lg in reversed(langs):
        pred = F.when(F.col(f"c_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    has_cjk = F.col("_text").rlike("[一-鿿]")
    return d.select(
        "docid",
        F.when(has_cjk, F.lit("zh")).otherwise(pred).alias("pred_lang"),
        best.alias("evidence"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(docid, n_tokens, stop_ratio, mean_token_len, punct_ratio, quality).

    quality = 0.4*min(n_tokens,100)/100 + 0.3*(1 - |stop_ratio - 0.4|)
            + 0.2*(1 - punct_ratio) + 0.1*min(mean_token_len,8)/8
    — the standard length / stopword-balance / punctuation-noise heuristic
    family (C4/Gopher-style rules; public knowledge), exact formula ours.
    """
    raw = F.coalesce(raw_tokens_expr(F.col(text_col)), F.array())
    d = df.select(
        F.col(id_col).alias("docid"),
        F.col(text_col).alias("_text"),
        raw.alias("_raw"),
    ).select(
        "docid", "_text",
        F.size("_raw").alias("n_tokens"),
        F.size(F.filter("_raw", lambda t: F.lower(t).isin(*ENGLISH_STOP_WORDS))).alias("_n_stop"),
        F.aggregate(
            F.transform("_raw", F.length), F.lit(0), lambda a, x: a + x
        ).alias("_sum_len"),
    )
    n_tok = F.col("n_tokens").cast("double")
    stop_ratio = F.when(F.col("n_tokens") > 0, F.col("_n_stop") / n_tok).otherwise(0.0)
    mean_len = F.when(F.col("n_tokens") > 0, F.col("_sum_len") / n_tok).otherwise(0.0)
    n_chars = F.length("_text").cast("double")
    n_clean = F.length(F.regexp_replace("_text", "[A-Za-z0-9 ]", "")).cast("double")
    punct_ratio = F.when(n_chars > 0, n_clean / n_chars).otherwise(0.0)
    quality = (
        0.4 * F.least(n_tok, F.lit(100.0)) / 100.0
        + 0.3 * (1.0 - F.abs(stop_ratio - 0.4))
        + 0.2 * (1.0 - punct_ratio)
        + 0.1 * F.least(mean_len, F.lit(8.0)) / 8.0
    )
    return d.select(
        "docid",
        "n_tokens",
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(docid, n_ws_tokens, n_raw_tokens, n_terms, n_distinct_terms, ttr):
    whitespace count vs analyzer count vs post-filter index terms."""
    raw = F.coalesce(raw_tokens_expr(F.col(text_col)), F.array())
    terms = F.coalesce(tokens_expr(F.col(text_col)), F.array())
    ws = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    d = df.select(
        F.col(id_col).alias("docid"),
        ws.alias("n_ws_tokens"),
        F.size(raw).alias("n_raw_tokens"),
        F.size(terms).alias("n_terms"),
        F.size(F.array_distinct(terms)).alias("n_distinct_terms"),
    )
    ttr = F.when(
        F.col("n_terms") > 0,
        F.col("n_distinct_terms") / F.col("n_terms").cast("double"),
    ).otherwise(0.0)
    return d.select(
        "docid", "n_ws_tokens", "n_raw_tokens", "n_terms", "n_distinct_terms",
        F.round(ttr, 4).alias("ttr"),
    )


FP_MOD = (1 << 61) - 1  # Mersenne prime modulus


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(docid, fingerprint): order-sensitive rolling document fingerprint.

    sum over positions of hash64(term || '@' || position) truncated to 32
    bits (so the sum of <= 1e6 tokens stays inside int64 under ANSI mode),
    reduced mod a Mersenne prime.  Position-salted hashing makes the
    fingerprint sensitive to token order — 'a b' != 'b a' — unlike bag-of-
    words hashes."""
    terms = F.coalesce(tokens_expr(F.col(text_col)), F.array())
    contrib = F.transform(
        terms,
        lambda t, i: F.pmod(
            hash64_col(F.concat(t, F.lit("@"), i.cast("string"))), F.lit(1 << 32)
        ),
    )
    total = F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)
    return df.select(
        F.col(id_col).alias("docid"),
        F.pmod(total, F.lit(FP_MOD)).alias("fingerprint"),
    )


# --- BPE-ish token counting (GPT-2 pretokenizer, public: openai/gpt-2
# encoder.py pat) ------------------------------------------------------------
#
#   's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+
#
# The (?!\S) lookahead (a whitespace run sheds its LAST char into the next
# token) is Java-regex-fine but not RE2/DuckDB-expressible; for the oracle
# the match COUNT decomposes exactly.  A maximal whitespace run of length n
# followed by a token char contributes: one token for its first n-1 chars
# (the backtracked \s+(?!\S) match) when n >= 2, plus one token for its LAST
# char unless that char is a literal space (only ' ' merges into the
# ` ?\p{L}+`-family alternatives); a trailing run is always exactly one
# token.  So:
#   count = |base matches|
#         + |matches of \s{2,}\S|        (the n-1 tokens)
#         + |matches of [^\S ]\S|        (non-space last-char tokens)
#         + (1 if the text ends in whitespace)
# Differential-tested against the pure-Python spec tokenizer below.

BPE_PRETOKEN_BASE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
)


def bpe_pretoken_count_expr(text: Column) -> Column:
    base = F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_BASE), F.lit(0)))
    shed = F.size(F.regexp_extract_all(text, F.lit(r"\s{2,}\S"), F.lit(0)))
    hard = F.size(F.regexp_extract_all(text, F.lit(r"[^\S ]\S"), F.lit(0)))
    trail = F.when(text.rlike(r"\s$"), F.lit(1)).otherwise(F.lit(0))
    return F.when(text.isNull(), F.lit(0)).otherwise(base + shed + hard + trail)


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, n_ws_tokens, n_bpe_pretokens, bpe_per_ws): the cost estimator
    a training-data pipeline budgets with — whitespace words vs BPE-ish
    pretokens (the GPT-2 pretokenizer's units, an upper bound on merged BPE
    tokens per word)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, " "), lambda t: t != ""))
    ws = F.when(text.isNull(), F.lit(0)).otherwise(ws)
    d = df.select(
        F.col(id_col).alias("docid"),
        ws.alias("n_ws_tokens"),
        bpe_pretoken_count_expr(text).alias("n_bpe_pretokens"),
    )
    ratio = F.when(
        F.col("n_ws_tokens") > 0,
        F.col("n_bpe_pretokens") / F.col("n_ws_tokens").cast("double"),
    ).otherwise(0.0)
    return d.select(
        "docid", "n_ws_tokens", "n_bpe_pretokens",
        F.round(ratio, 4).alias("bpe_per_ws"),
    )


def bpe_pretokenize_py(text: str) -> list[str]:
    """Pure-Python GPT-2 pretokenizer (spec implementation with the real
    lookahead, unicodedata categories for \\p{L}/\\p{N}) — the independent
    oracle the Spark formula is differential-tested against."""
    import unicodedata

    def is_l(c: str) -> bool:
        return unicodedata.category(c).startswith("L")

    def is_n(c: str) -> bool:
        return unicodedata.category(c).startswith("N")

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        for c in ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d"):
            if text.startswith(c, i):
                out.append(c)
                i += len(c)
                break
        else:
            j = i
            has_sp = text[j] == " " if j < n else False
            k = j + 1 if has_sp else j
            if k < n and is_l(text[k]):
                e = k
                while e < n and is_l(text[e]):
                    e += 1
                out.append(text[j:e]); i = e
            elif k < n and is_n(text[k]):
                e = k
                while e < n and is_n(text[e]):
                    e += 1
                out.append(text[j:e]); i = e
            elif k < n and not text[k].isspace() and not is_l(text[k]) and not is_n(text[k]):
                e = k
                while e < n and not text[e].isspace() and not is_l(text[e]) and not is_n(text[e]):
                    e += 1
                out.append(text[j:e]); i = e
            elif text[i].isspace():
                e = i
                while e < n and text[e].isspace():
                    e += 1
                # \s+(?!\S): keep the last space for the next token when a
                # non-space follows and the run is >= 2; a 1-space run before
                # non-space never matched this branch but the ` ?X+`
                # alternatives above already consumed it, so reaching here
                # with e == i+1 and e < n means an isolated space before a
                # char no alternative takes — emit it alone like `\s+`
                if e < n and e - i >= 2:
                    out.append(text[i:e - 1]); i = e - 1
                else:
                    out.append(text[i:e]); i = e
            else:
                out.append(text[i]); i += 1
    return out
