"""Goldens for the round-3b token-filter factories (ASCIIFolding,
WordDelimiter, utility factories) — expected values follow the reference's
factory tests (lucene/analysis/common/src/test/.../miscellaneous/)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.filters import (
    ascii_fold_text,
    ascii_folding_filter,
    capitalization_filter,
    keep_word_filter,
    limit_token_count_filter,
    pattern_replace_filter,
    reverse_string_filter,
    stop_filter,
    trim_filter,
    truncate_filter,
    word_delimiter_filter,
)


def _run(spark, tokens: list[str], expr) -> list[str]:
    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    return df.select(expr(F.col("toks")).alias("out")).head().out


# --- ASCIIFolding (TestASCIIFoldingFilter.java cases) ---

FOLD_CASES = [
    ("Des", "Des"),
    ("mot", "mot"),
    ("clés", "cles"),
    ("À", "A"),
    ("LA", "LA"),
    ("CHAÎNE", "CHAINE"),
    ("Ç", "C"),
    ("déjà", "deja"),
    ("Ĳ", "IJ"),
    ("œuvre", "oeuvre"),
    ("straße", "strasse"),
    ("Þor", "THor"),
    ("łódź", "lodz"),
    ("Øre", "Ore"),
    ("señor", "senor"),
]


def test_ascii_folding_spark(spark):
    got = _run(spark, [a for a, _ in FOLD_CASES], ascii_folding_filter)
    assert got == [b for _, b in FOLD_CASES]


def test_ascii_folding_python_mirror():
    for a, b in FOLD_CASES:
        assert ascii_fold_text(a) == b


# --- WordDelimiter (TestWordDelimiterFilter.java cases, bag-of-terms) ---

def test_wdf_basic_splits(spark):
    got = _run(spark, ["PowerShot", "wi-fi", "SD500", "PowerShot500"],
               word_delimiter_filter)
    assert got == ["Power", "Shot", "wi", "fi", "SD", "500",
                   "Power", "Shot", "500"]


def test_wdf_upper_run_boundary(spark):
    got = _run(spark, ["HTTPServer", "XMLHttpRequest"], word_delimiter_filter)
    assert got == ["HTTP", "Server", "XML", "Http", "Request"]


def test_wdf_possessive(spark):
    got = _run(spark, ["O'Neil's", "you've"], word_delimiter_filter)
    assert got == ["O", "Neil", "you", "ve"]


def test_wdf_catenate_words(spark):
    got = _run(
        spark, ["wi-fi", "solo"],
        lambda t: word_delimiter_filter(t, catenate_words=True),
    )
    # catenation emits only for >=2-part runs
    assert got == ["wi", "fi", "wifi", "solo"]


def test_wdf_catenate_numbers_and_all(spark):
    got = _run(
        spark, ["500-42"],
        lambda t: word_delimiter_filter(
            t, catenate_numbers=True, catenate_all=True
        ),
    )
    assert got == ["500", "42", "50042", "50042"]


def test_wdf_preserve_original(spark):
    got = _run(
        spark, ["wi-fi"],
        lambda t: word_delimiter_filter(t, preserve_original=True),
    )
    assert got == ["wi-fi", "wi", "fi"]


def test_wdf_flags_off(spark):
    got = _run(
        spark, ["PowerShot", "SD500"],
        lambda t: word_delimiter_filter(
            t, split_on_case_change=False, split_on_numerics=False
        ),
    )
    assert got == ["PowerShot", "SD500"]


def test_wdf_number_parts_off(spark):
    got = _run(
        spark, ["SD500"],
        lambda t: word_delimiter_filter(t, generate_number_parts=False),
    )
    assert got == ["SD"]


# --- utility factories ---

def test_utility_factories(spark):
    assert _run(spark, ["  a  ", "b"], trim_filter) == ["a", "b"]
    assert _run(
        spark, ["foo123bar"],
        lambda t: pattern_replace_filter(t, "[0-9]+", "#"),
    ) == ["foo#bar"]
    assert _run(
        spark, ["keep", "drop"],
        lambda t: keep_word_filter(t, ("keep",)),
    ) == ["keep"]
    assert _run(
        spark, ["the", "query"],
        lambda t: stop_filter(t, ("the",)),
    ) == ["query"]
    assert _run(spark, ["abc"], reverse_string_filter) == ["cba"]
    assert _run(
        spark, ["abcdef"], lambda t: truncate_filter(t, 3)
    ) == ["abc"]
    assert _run(spark, ["hELLO"], capitalization_filter) == ["Hello"]
    assert _run(
        spark, ["a", "b", "c"], lambda t: limit_token_count_filter(t, 2)
    ) == ["a", "b"]


# --- CharFilters (pre-tokenizer) ---


def test_mapping_char_filter(spark):
    from lucene_solr_spark.analysis.charfilters import mapping_char_filter
    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer

    df = spark.createDataFrame([("c++ and c#m fussball",)], "text string")
    mapped = mapping_char_filter(
        F.col("text"), {"c++": "cplusplus", "c#": "csharp", "ß": "ss"}
    )
    got = df.select(StandardAnalyzer().tokens_col(mapped).alias("t")).head().t
    assert got == ["cplusplus", "csharpm", "fussball"]


def test_mapping_longest_match_first(spark):
    from lucene_solr_spark.analysis.charfilters import mapping_char_filter

    df = spark.createDataFrame([("abc ab",)], "text string")
    got = df.select(
        mapping_char_filter(F.col("text"), {"ab": "X", "abc": "Y"}).alias("t")
    ).head().t
    assert got == "Y X"  # 'abc' wins over 'ab' at the same start


def test_pattern_replace_char_filter(spark):
    from lucene_solr_spark.analysis.charfilters import pattern_replace_char_filter

    df = spark.createDataFrame([("a-b a--b",)], "text string")
    got = df.select(
        pattern_replace_char_filter(F.col("text"), "-+", " ").alias("t")
    ).head().t
    assert got == "a b a b"
