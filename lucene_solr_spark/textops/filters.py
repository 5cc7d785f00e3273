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
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def duplicate_ngram_fraction(
    df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, total_ngrams, distinct_ngrams, dup_frac): the fraction of
    word n-grams that are repeats of an earlier n-gram in the same doc —
    Gopher's duplicate-n-gram repetition signal.  0.0 for docs shorter than
    ``n`` words."""
    toks = _ws_tokens(F.col(text_col))
    # sequence(1, 0) counts DOWN in Spark — docs shorter than n get an
    # explicit empty gram list
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = df.select(
        F.col(id_col).alias("docid"),
        F.size(grams).alias("total_ngrams"),
        F.size(F.array_distinct(grams)).alias("distinct_ngrams"),
    )
    frac = F.when(
        F.col("total_ngrams") > 0,
        1.0 - F.col("distinct_ngrams") / F.col("total_ngrams").cast("double"),
    ).otherwise(0.0)
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
    2-gram fraction <= max_dup_2gram, and >= min_stop_hits occurrences of
    the 8 common stop words.  Returns the metrics plus the ``keep``
    verdict — callers ``filter("keep")`` or inspect the reasons."""
    toks = _ws_tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = df.select(
        F.col(id_col).alias("docid"),
        F.col(text_col).alias("_text"),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
        ).alias("_sum_len"),
        F.size(grams).alias("_g_total"),
        F.size(F.array_distinct(grams)).alias("_g_distinct"),
        F.size(
            F.filter(toks, lambda t: F.lower(t).isin(*GOPHER_STOP_WORDS))
        ).alias("stop_hits"),
    )
    n_tok = F.col("n_tokens").cast("double")
    mean_len = F.when(F.col("n_tokens") > 0, F.col("_sum_len") / n_tok).otherwise(0.0)
    n_chars = F.length("_text").cast("double")
    n_sym = F.length(F.regexp_replace("_text", "[A-Za-z0-9 ]", "")).cast("double")
    symbol_ratio = F.when(n_chars > 0, n_sym / n_chars).otherwise(0.0)
    dup2 = F.when(
        F.col("_g_total") > 0,
        1.0 - F.col("_g_distinct") / F.col("_g_total").cast("double"),
    ).otherwise(0.0)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (dup2 <= max_dup_2gram)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return d.select(
        "docid",
        "n_tokens",
        F.round(mean_len, 4).alias("mean_len"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(dup2, 4).alias("dup_2gram_frac"),
        "stop_hits",
        keep.alias("keep"),
    )
