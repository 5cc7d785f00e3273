"""CollationField analog: locale sort orders, strength modifiers, and
locale-order range queries — golden orderings per well-known collation facts
(Swedish å/ä/ö after z; German umlauts sort with their base letters;
case-insensitive secondary strength)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.collation import (
    collated,
    collation_name,
    collation_range,
)


def _sorted(spark, words, language, strength="tertiary"):
    df = spark.createDataFrame([(w,) for w in words], "s string")
    return [
        r.s for r in df.orderBy(collated("s", language, strength=strength), "s").collect()
    ]


def test_collation_name_mapping():
    assert collation_name("de") == "de"
    assert collation_name("de", "DE") == "de_DE"
    assert collation_name("sv", strength="secondary") == "sv_CI"
    assert collation_name("fr", strength="primary") == "fr_CI_AI"
    with pytest.raises(ValueError):
        collation_name("en", strength="bogus")


def test_swedish_a_ring_sorts_after_z(spark):
    """sv: å, ä, ö are the last letters of the alphabet (after z)."""
    out = _sorted(spark, ["åka", "zebra", "apple", "ärlig", "öga"], "sv")
    assert out == ["apple", "zebra", "åka", "ärlig", "öga"]


def test_german_umlauts_sort_with_base_letters(spark):
    """de (DIN 5007-1): ä sorts with a — Äpfel before Birne before Zug,
    unlike binary order where Ä (U+00C4) lands after Z."""
    out = _sorted(spark, ["Zug", "Äpfel", "Birne", "Apfel"], "de")
    assert out == ["Apfel", "Äpfel", "Birne", "Zug"]
    binary = [r.s for r in spark.createDataFrame(
        [("Zug",), ("Äpfel",), ("Birne",), ("Apfel",)], "s string"
    ).orderBy("s").collect()]
    assert binary == ["Apfel", "Birne", "Zug", "Äpfel"]  # the broken order


def test_secondary_strength_is_case_insensitive(spark):
    df = spark.createDataFrame([("APPLE",), ("apple",), ("Banana",)], "s string")
    ci = collated("s", "en", strength="secondary")
    groups = df.groupBy(ci.alias("k")).count().collect()
    # APPLE and apple collapse into one group under _CI
    assert sorted((r["count"]) for r in groups) == [1, 2]


def test_primary_strength_folds_accents(spark):
    df = spark.createDataFrame([("café",), ("CAFE",), ("cafe",)], "s string")
    ai = collated("s", "fr", strength="primary")
    n = df.groupBy(ai.alias("k")).count().collect()
    assert len(n) == 1 and n[0]["count"] == 3


def test_collation_range_locale_order(spark):
    """Range [Apfel, Birne] in de order includes Äpfel (which binary order
    would exclude — Ä > B in code points)."""
    df = spark.createDataFrame(
        [("Apfel",), ("Äpfel",), ("Birne",), ("Zug",)], "s string"
    )
    got = {
        r.s for r in df.filter(
            collation_range("s", "Apfel", "Birne", "de")
        ).collect()
    }
    assert got == {"Apfel", "Äpfel", "Birne"}
    binary = {
        r.s for r in df.filter(
            (F.col("s") >= "Apfel") & (F.col("s") <= "Birne")
        ).collect()
    }
    assert "Äpfel" not in binary


def test_spark_matches_duckdb_icu_order(spark):
    """Cross-engine golden: Spark's ICU collation and DuckDB's ICU collation
    produce the same locale order for a fixed German/Swedish word set —
    the evidence a graded oracle row would rely on."""
    import duckdb

    words = ["Zug", "Äpfel", "Birne", "Apfel", "öde", "Ofen", "straße", "strasse"]
    spark_de = _sorted(spark, words, "de")
    duck_de = [
        r[0]
        for r in duckdb.sql(
            "SELECT s FROM (VALUES "
            + ",".join(f"('{w}')" for w in words)
            + ") t(s) ORDER BY s COLLATE de, s"
        ).fetchall()
    ]
    assert spark_de == duck_de
