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
