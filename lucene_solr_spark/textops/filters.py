"""Document-level quality FILTERS: the keep/drop rules a pre-training
pipeline applies before anything else.

Reference: the Gopher/MassiveText rule set (Rae et al. 2021, Appendix A —
public knowledge): word-count bounds, mean-word-length window, symbol-to-
character ratio, the "contains at least 2 of 8 common English stop words"
signal, and repetition thresholds (duplicate n-gram fraction).  C4 (Raffel
et al. 2020 §2.2) applies the same family.  Exact thresholds are knobs; the
defaults follow the published values.

All pure Catalyst over whitespace tokens (the papers' rules are defined on
words, not analyzer terms) — codegen'd array expressions, embarrassingly
parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's 8-word stop list for the "natural language" signal
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _ws_tokens(text_col: Column) -> Column:
    # regex split: the papers' rules are over whitespace-separated words, so
    # newlines/tabs are separators, not token glue
    return F.filter(F.split(text_col, r"\s+"), lambda t: t != "")


def _grams(toks: Column, n: int) -> Column:
    """Word n-grams as joined strings; docs shorter than ``n`` get an
    explicit empty list (sequence(1, 0) counts DOWN in Spark)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_frac(total: Column, distinct: Column) -> Column:
    return F.when(total > 0, 1.0 - distinct / total.cast("double")).otherwise(0.0)


def duplicate_ngram_fraction(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, total_ngrams, distinct_ngrams, dup_frac): the fraction of
    word n-grams that are repeats of an earlier n-gram in the same doc —
    Gopher's duplicate-n-gram repetition signal.  0.0 for docs shorter than
    ``n`` words."""
    toks = _ws_tokens(F.col(text_col))
    grams = _grams(toks, n)
    d = df.select(
        F.col(id_col).alias("docid"),
        F.size(grams).alias("total_ngrams"),
        F.size(F.array_distinct(grams)).alias("distinct_ngrams"),
    )
    frac = _dup_frac(F.col("total_ngrams"), F.col("distinct_ngrams"))
    return d.select(
        "docid", "total_ngrams", "distinct_ngrams", frac.alias("dup_frac")
    )


def gopher_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_dup_2gram: float = 0.2,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Rule-based keep/drop per the Gopher filter family: word count in
    [min_tokens, max_tokens], mean word length in [min_mean_len,
    max_mean_len], symbol-to-character ratio <= max_symbol_ratio, duplicate
    2-gram fraction <= max_dup_2gram, and >= min_stop_hits DISTINCT words
    of the 8-word stop list present.  Returns the metrics plus the ``keep``
    verdict — callers ``filter("keep")`` or inspect the reasons."""
    toks = _ws_tokens(F.col(text_col))
    grams = _grams(toks, 2)
    d = df.select(
        F.col(id_col).alias("docid"),
        F.col(text_col).alias("_text"),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
        ).alias("_sum_len"),
        F.size(grams).alias("_g_total"),
        F.size(F.array_distinct(grams)).alias("_g_distinct"),
        # DISTINCT stop words present — the published rule is "contains at
        # least 2 OF the 8 stop words", not 2 total occurrences
        F.size(
            F.array_distinct(
                F.filter(
                    F.transform(toks, F.lower),
                    lambda t: t.isin(*GOPHER_STOP_WORDS),
                )
            )
        ).alias("stop_hits"),
    )
    n_tok = F.col("n_tokens").cast("double")
    mean_len = F.when(F.col("n_tokens") > 0, F.col("_sum_len") / n_tok).otherwise(0.0)
    n_chars = F.length("_text").cast("double")
    n_sym = F.length(F.regexp_replace("_text", r"[A-Za-z0-9\s]", "")).cast("double")
    symbol_ratio = F.when(n_chars > 0, n_sym / n_chars).otherwise(0.0)
    dup2 = _dup_frac(F.col("_g_total"), F.col("_g_distinct"))
    # the verdict evaluates the ROUNDED metrics so the returned reasons can
    # never contradict it at a threshold boundary
    r_mean, r_sym, r_dup = (
        F.round(mean_len, 4),
        F.round(symbol_ratio, 4),
        F.round(dup2, 4),
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (r_mean >= min_mean_len)
        & (r_mean <= max_mean_len)
        & (r_sym <= max_symbol_ratio)
        & (r_dup <= max_dup_2gram)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return d.select(
        "docid",
        "n_tokens",
        r_mean.alias("mean_len"),
        r_sym.alias("symbol_ratio"),
        r_dup.alias("dup_2gram_frac"),
        "stop_hits",
        keep.alias("keep"),
    )
