"""Function-query compiler: ValueSourceParser registry -> Catalyst Columns."""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.functions import parse_function_query


@pytest.fixture(scope="module")
def df(spark):
    rows = [(1, 4.0, 2.0, "kitten", None), (2, 9.0, 3.0, "sitting", 7.0)]
    return spark.createDataFrame(rows, "id long, x double, y double, s string, maybe double")


def _vals(df, col):
    return {r.id: r.v for r in df.select("id", col.alias("v")).collect()}


def test_arithmetic_and_shaping(spark, df):
    assert _vals(df, parse_function_query("sum(x,y,1)")) == {1: 7.0, 2: 13.0}
    assert _vals(df, parse_function_query("div(x,y)")) == {1: 2.0, 2: 3.0}
    assert _vals(df, parse_function_query("sqrt(x)")) == {1: 2.0, 2: 3.0}
    got = _vals(df, parse_function_query("log(x)"))
    assert got[1] == pytest.approx(math.log10(4.0))
    assert _vals(df, parse_function_query("linear(x,2,1)")) == {1: 9.0, 2: 19.0}
    # recip(x,m,a,b) = a/(m*x+b)
    assert _vals(df, parse_function_query("recip(x,1,6,2)")) == {1: 1.0, 2: pytest.approx(6 / 11)}
    # map: x in [4,5] -> 0 else x
    assert _vals(df, parse_function_query("map(x,4,5,0)")) == {1: 0.0, 2: 9.0}


def test_conditionals_and_exists(spark, df):
    assert _vals(df, parse_function_query("def(maybe,42)")) == {1: 42.0, 2: 7.0}
    assert _vals(df, parse_function_query("exists(maybe)")) == {1: False, 2: True}
    got = _vals(df, parse_function_query("if(exists(maybe),x,y)"))
    assert got == {1: 2.0, 2: 9.0}


def test_strdist_normalized_levenshtein(spark, df):
    got = _vals(df, parse_function_query('strdist(s,"sitting")'))
    # kitten vs sitting: dist 3, maxlen 7 -> 1 - 3/7
    assert got[1] == pytest.approx(1 - 3 / 7)
    assert got[2] == 1.0


def test_ms_with_pinned_now(spark):
    rows = [(1, "2026-01-01 00:00:00")]
    d = spark.createDataFrame(rows, "id long, ts string").select(
        "id", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts").alias("ts")
    )
    now_ms = 1767225600000 + 86400000  # one day after
    got = _vals(d, parse_function_query("ms(NOW,ts)", now_epoch_ms=now_ms))
    assert got[1] == 86400000


def test_parser_errors():
    with pytest.raises(ValueError):
        parse_function_query("nosuchfn(1)")
    with pytest.raises(ValueError):
        parse_function_query("ms(NOW,ts)")  # now not pinned
    with pytest.raises(ValueError):
        parse_function_query("div(1)")  # arity
    with pytest.raises(ValueError):
        parse_function_query("sum(1,2) trailing")
