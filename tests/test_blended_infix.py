"""BlendedInfixSuggester: position-blended weights, prefix-token handling,
linear vs reciprocal blenders (BlendedInfixSuggester.java:61-266)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.suggest import suggest_blended_infix


@pytest.fixture(scope="module")
def sugg(spark):
    rows = [
        ("star wars: episode v - the empire strikes back", 8),
        ("the empire strikes back", 12),
        ("empire of the sun", 10),
        ("war of the worlds", 9),
    ]
    return spark.createDataFrame(rows, "text string, weight long")


def _got(df):
    return [
        (r.suggestion, int(r.score), int(r.position)) for r in df.collect()
    ]


def test_linear_blending_prefers_early_match(sugg):
    got = _got(suggest_blended_infix(sugg, "empire ", blender="linear"))
    # 'empire of the sun': position 0 -> 10*(1-0) = 10
    # 'the empire strikes back': position 1 -> 12*(1-0.1) = 10.8 -> 10
    # 'star wars ... empire ...': position 6 (the '-' is a
    # whitespace token) -> 8*(1-0.6) = 3.2 -> 3
    want = [
        ("empire of the sun", 10, 0),
        ("the empire strikes back", 10, 1),
        ("star wars: episode v - the empire strikes back", 3, 6),
    ]
    assert got == want


def test_reciprocal_blending(sugg):
    got = _got(suggest_blended_infix(sugg, "empire ", blender="reciprocal"))
    # 10/(1+0)=10, 12/(1+1)=6, 8/(1+6)=1
    assert got == [
        ("empire of the sun", 10, 0),
        ("the empire strikes back", 6, 1),
        ("star wars: episode v - the empire strikes back", 1, 6),
    ]


def test_trailing_prefix_token(sugg):
    # no trailing space -> 'emp' is a prefix token
    got = _got(suggest_blended_infix(sugg, "emp", blender="reciprocal"))
    assert [s for s, _, _ in got] == [
        "empire of the sun",
        "the empire strikes back",
        "star wars: episode v - the empire strikes back",
    ]


def test_all_terms_required(sugg):
    got = _got(suggest_blended_infix(sugg, "empire strikes ", blender="linear"))
    # 'empire of the sun' lacks 'strikes' and must drop out; position is
    # the FIRST matching token's position
    assert [s for s, _, _ in got] == [
        "the empire strikes back",
        "star wars: episode v - the empire strikes back",
    ]
    assert got[0][2] == 1 and got[1][2] == 6


def test_linear_can_go_negative():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    one = spark.createDataFrame(
        [("a b c d e f g h i j k l target", 100)], "text string, weight long"
    )
    got = _got(suggest_blended_infix(one, "target ", blender="linear"))
    # position 12 -> 100*(1-1.2) = -20 (Java allows negative blends)
    assert got == [("a b c d e f g h i j k l target", -20, 12)]
