"""Gopher-style document filters: repetition fraction + rule verdicts."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.textops.filters import (
    duplicate_ngram_fraction,
    gopher_filter,
)


def test_duplicate_ngram_fraction(spark):
    rows = [
        (0, "the cat sat on the cat sat on a mat"),  # 9 bigrams, 6 distinct
        (1, "all words here are fully distinct tokens"),
        (2, "one"),  # shorter than n -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.docid: r for r in duplicate_ngram_fraction(df, n=2).collect()}
    assert out[0].total_ngrams == 9 and out[0].distinct_ngrams == 6
    assert out[0].dup_frac == pytest.approx(1 - 6 / 9)
    assert out[1].dup_frac == 0.0
    assert out[2].total_ngrams == 0 and out[2].dup_frac == 0.0


def test_gopher_filter_rules(spark):
    good = (
        "the quick brown fox jumps over that lazy dog and runs off with glee "
        "while birds watch from tall trees near a quiet river bend as evening "
        "light settles softly across those open fields where children played"
    )
    rows = [
        (0, good.strip()),                       # passes everything
        (1, "short text only"),                  # too few tokens
        (2, ("spam " * 60).strip()),             # no stop words + repetition
        (3, ("@@ ## $$ %% " * 20).strip()),      # symbol ratio + mean len
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.docid: r for r in gopher_filter(df, min_tokens=30).collect()}
    assert out[0].keep
    assert not out[1].keep          # n_tokens < 30
    assert not out[2].keep and out[2].stop_hits == 0
    assert not out[2].keep and out[2].dup_2gram_frac > 0.9
    assert not out[3].keep and out[3].symbol_ratio > 0.1


def test_gopher_filter_thresholds_are_knobs(spark):
    text = ("word " * 40).strip()
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    strict = gopher_filter(df).collect()[0]         # 40 < default 50
    loose = gopher_filter(
        df, min_tokens=10, min_stop_hits=0, max_dup_2gram=1.0
    ).collect()[0]
    assert not strict.keep and loose.keep


# --- CommonGrams (goldens from CommonGramsFilterTest.java:89-238) ---

def _cg(spark, mode, words, common=("of", "the", "s")):
    from lucene_solr_spark.analysis.filters import (
        common_grams_filter,
        common_grams_query_filter,
    )
    from pyspark.sql import functions as F

    fn = common_grams_filter if mode == "index" else common_grams_query_filter
    df = spark.createDataFrame([(words,)], "toks array<string>")
    return df.select(fn(F.col("toks"), common).alias("out")).first().out


def test_common_grams_index_mode(spark):
    assert _cg(spark, "index", ["the", "fox"]) == ["the", "the_fox", "fox"]
    assert _cg(spark, "index", ["fox", "of"]) == ["fox", "fox_of", "of"]
    assert _cg(spark, "index", ["brown", "fox"]) == ["brown", "fox"]
    assert _cg(spark, "index", ["quick", "brown", "the"]) == [
        "quick", "brown", "brown_the", "the"
    ]
    assert _cg(spark, "index", ["the"]) == ["the"]
    assert _cg(spark, "index", []) == []


def test_common_grams_query_mode(spark):
    cases = {
        ("brown", "fox"): ["brown", "fox"],
        ("the", "fox"): ["the_fox"],
        ("fox", "of"): ["fox_of"],
        ("of", "the"): ["of_the"],
        ("the",): ["the"],
        ("foo",): ["foo"],
        ("quick", "brown", "fox"): ["quick", "brown", "fox"],
        ("quick", "brown", "the"): ["quick", "brown_the"],
        ("quick", "the", "brown"): ["quick_the", "the_brown"],
        ("fox", "of", "the"): ["fox_of", "of_the"],
        ("the", "quick", "brown"): ["the_quick", "quick", "brown"],
        ("the", "fox", "of"): ["the_fox", "fox_of"],
        ("of", "the", "fox"): ["of_the", "the_fox"],
        ("of", "the", "of"): ["of_the", "the_of"],
    }
    for words, want in cases.items():
        got = _cg(spark, "query", list(words))
        assert got == want, (words, got, want)
