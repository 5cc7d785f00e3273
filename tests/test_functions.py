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
    # explicit 'edit' measure accepted, identical result
    got2 = _vals(df, parse_function_query('strdist(s,"sitting","edit")'))
    assert got2 == got


def test_strdist_rejects_unimplemented_measures():
    # StrDistanceFunction dispatches on the measure arg; answering with the
    # wrong measure silently would be a correctness bug
    with pytest.raises(ValueError, match="strdist.*'jw'"):
        parse_function_query('strdist(s,"sitting","jw")')
    with pytest.raises(ValueError, match="strdist"):
        parse_function_query("strdist(s,s,x)")  # non-literal measure


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


# ---------------------------------------------------------------------------
# date math (DateMathParser.java)
# ---------------------------------------------------------------------------

def test_date_math_rounding_and_arith():
    from lucene_solr_spark.functions import parse_date_math

    # 2026-03-15T12:34:56.789Z
    now = 1773578096789
    assert parse_date_math("NOW", now) == now
    assert parse_date_math("NOW/DAY", now) == 1773532800000      # 00:00 UTC
    assert parse_date_math("NOW/HOUR", now) == 1773576000000
    assert parse_date_math("NOW/YEAR", now) == 1767225600000     # 2026-01-01
    assert parse_date_math("NOW/DAY+1DAY", now) - parse_date_math("NOW/DAY", now) == 86_400_000
    assert parse_date_math("NOW-30DAYS", now) == now - 30 * 86_400_000
    assert parse_date_math("NOW+2HOURS-90MINUTES", now) == now + 30 * 60_000
    # ISO anchor
    assert parse_date_math("2026-01-01T00:00:00Z+1MONTH", 0) == 1769904000000
    # calendar-aware month clamp: Jan 31 + 1 MONTH -> Feb 28 (2026 not leap)
    jan31 = 1769818321000  # 2026-01-30T23:32:01Z... use explicit ISO instead
    assert parse_date_math("2026-01-31T10:00:00Z+1MONTH", 0) == parse_date_math(
        "2026-02-28T10:00:00Z", 0
    )
    # unit aliases and implicit 1
    assert parse_date_math("NOW+DAY", now) == parse_date_math("NOW+1DAYS", now)


def test_date_math_rejects_garbage():
    import pytest

    from lucene_solr_spark.functions import parse_date_math

    for bad in ("TODAY", "NOW/5DAY", "NOW+DAY junk", "NOW**2"):
        with pytest.raises(ValueError):
            parse_date_math(bad, 0)


def test_with_scale_range_and_degenerate(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions import with_scale

    df = spark.createDataFrame([(1, 10), (2, 20), (3, 40)], "id int, v int")
    out = {r.id: r.scaled for r in with_scale(df, F.col("v"), 0.0, 1.0).collect()}
    assert out == {1: 0.0, 2: pytest.approx(1 / 3), 3: 1.0}
    # ScaleFloatFunction.java:109 — degenerate source range scales to 0
    same = spark.createDataFrame([(1, 7), (2, 7)], "id int, v int")
    vals = {r.scaled for r in with_scale(same, F.col("v"), 2.0, 5.0).collect()}
    assert vals == {2.0}

def test_vector_distances(spark):
    d = spark.createDataFrame(
        [(1, 1.0, 2.0, 4.0, 6.0)], "id long, x1 double, y1 double, x2 double, y2 double"
    )
    # sqedist: 3^2 + 4^2 = 25; dist(2,...) = 5; dist(1,...) = 7
    assert _vals(d, parse_function_query("sqedist(x1,y1,x2,y2)")) == {1: 25.0}
    assert _vals(d, parse_function_query("dist(2,x1,y1,x2,y2)")) == {1: 5.0}
    assert _vals(d, parse_function_query("dist(1,x1,y1,x2,y2)")) == {1: 7.0}
    # dist(0,...): count of differing dims (sparseness)
    assert _vals(d, parse_function_query("dist(0,x1,y1,x1,y2)")) == {1: 1.0}
    # dist(3,...) general Minkowski
    got = _vals(d, parse_function_query("dist(3,x1,y1,x2,y2)"))
    assert got[1] == pytest.approx((3**3 + 4**3) ** (1 / 3))
    with pytest.raises(ValueError, match="power"):
        parse_function_query("dist(x1,y1,x2,x2,y2)")


def test_geodist_and_hsin(spark):
    # London (51.5074, -0.1278) -> Paris (48.8566, 2.3522) ~ 343.5 km
    d = spark.createDataFrame(
        [(1, 51.5074, -0.1278, 48.8566, 2.3522)],
        "id long, lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = _vals(d, parse_function_query("geodist(lat1,lon1,lat2,lon2)"))
    assert got[1] == pytest.approx(343.5, abs=1.0)
    # hsin with unit radius over radians == geodist/earth_radius
    got2 = _vals(
        d,
        parse_function_query(
            "hsin(1,product(lat1,0.017453292519943295),"
            "product(lon1,0.017453292519943295),"
            "product(lat2,0.017453292519943295),"
            "product(lon2,0.017453292519943295))"
        ),
    )
    from lucene_solr_spark.functions.value_sources import EARTH_MEAN_RADIUS_KM

    assert got2[1] * EARTH_MEAN_RADIUS_KM == pytest.approx(got[1], rel=1e-9)


def test_index_stat_functions(spark):
    from lucene_solr_spark.index.builder import build_index

    src = spark.createDataFrame(
        [(1, "spark index spark"), (2, "index engine"), (3, "spark")],
        "doc_id long, text string",
    )
    idx = build_index(spark, src, key_col="doc_id", docid_col="doc_id",
                      num_index_partitions=2, persist=False)
    d = idx.docs.withColumnRenamed("doc_id", "id")
    assert _vals(d, parse_function_query('docfreq(text,"spark")', index=idx))[1] == 2
    assert _vals(d, parse_function_query('totaltermfreq(text,"spark")', index=idx))[1] == 3
    assert _vals(d, parse_function_query("maxdoc()", index=idx))[1] == 3
    assert _vals(d, parse_function_query("sumtotaltermfreq(text)", index=idx))[1] == 6
    import math

    got = _vals(d, parse_function_query('idf(text,"engine")', index=idx))
    assert got[1] == pytest.approx(math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5)))
    # unknown term -> df 0, idf of 0-df
    assert _vals(d, parse_function_query('docfreq(text,"zzz")', index=idx))[1] == 0
    with pytest.raises(ValueError, match="index"):
        parse_function_query('docfreq(text,"spark")')


def test_norm_value_source(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.smallfloat import byte315_to_float, encode_norm

    src = spark.createDataFrame(
        [(1, "one two three four"), (2, "one")], "doc_id long, text string"
    )
    idx = build_index(spark, src, key_col="doc_id", docid_col="doc_id",
                      num_index_partitions=2, persist=False)
    got = {
        r.docid: r.v
        for r in idx.docs.select(
            "docid", parse_function_query("norm(text)").alias("v")
        ).collect()
    }
    import numpy as np

    for docid, nt in ((1, 4), (2, 1)):
        expect = float(byte315_to_float(encode_norm(np.array([nt])))[0])
        assert got[docid] == pytest.approx(expect, rel=1e-7)


def test_with_termfreq(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.functions import with_termfreq

    src = spark.createDataFrame(
        [(1, "spark index spark"), (2, "index engine"), (3, "spark")],
        "doc_id long, text string",
    )
    idx = build_index(spark, src, key_col="doc_id", docid_col="doc_id",
                      num_index_partitions=2, persist=False)
    got = {
        r.docid: r.termfreq
        for r in with_termfreq(idx.docs, idx, "spark").collect()
    }
    assert got == {1: 2, 2: 0, 3: 1}
    # termfreq through the parser points at the helper
    with pytest.raises(ValueError, match="with_termfreq"):
        parse_function_query('termfreq(text,"spark")')


def test_with_ord_and_rord(spark):
    from lucene_solr_spark.functions import with_ord

    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "a"), (5, None)], "id long, s string"
    )
    got = {r.id: r.ord for r in with_ord(df, "s").collect()}
    assert got == {1: 2, 2: 1, 3: 3, 4: 1, 5: 0}
    rgot = {r.id: r.rord for r in with_ord(df, "s", out="rord", reverse=True).collect()}
    assert rgot == {1: 2, 2: 3, 3: 1, 4: 3, 5: 0}


def test_with_scale_targets(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions import with_scale

    df = spark.createDataFrame([(1, 0), (2, 50), (3, 100)], "id int, v int")
    out = {r.id: r.scaled for r in with_scale(df, F.col("v"), 10.0, 20.0).collect()}
    assert out == {1: 10.0, 2: 15.0, 3: 20.0}


def test_constant_value_sources(spark, df):
    """pi()/e()/true()/false() (ValueSourceParser.java:577-588,664-676)."""
    assert _vals(df, parse_function_query("product(pi(),2)")) == {
        1: pytest.approx(2 * math.pi), 2: pytest.approx(2 * math.pi)
    }
    assert _vals(df, parse_function_query("ln(e())")) == {
        1: pytest.approx(1.0), 2: pytest.approx(1.0)
    }
    assert _vals(df, parse_function_query("if(true(),1,2)")) == {1: 1, 2: 1}
    assert _vals(df, parse_function_query("if(false(),1,2)")) == {1: 2, 2: 2}
    assert _vals(df, parse_function_query("not(false())")) == {1: True, 2: True}


def test_trig_and_conversion_parsers(spark, df):
    """The DoubleParser tail (ValueSourceParser.java: rad/deg/asin/acos/
    atan/sinh/cosh/tanh/hypot)."""
    assert _vals(df, parse_function_query("deg(pi())")) == {
        1: pytest.approx(180.0), 2: pytest.approx(180.0)
    }
    assert _vals(df, parse_function_query("rad(deg(1))")) == {
        1: pytest.approx(1.0), 2: pytest.approx(1.0)
    }
    assert _vals(df, parse_function_query("asin(sin(0.5))"))[1] == pytest.approx(0.5)
    assert _vals(df, parse_function_query("acos(cos(0.5))"))[1] == pytest.approx(0.5)
    assert _vals(df, parse_function_query("atan(tan(0.5))"))[1] == pytest.approx(0.5)
    got = _vals(df, parse_function_query("hypot(x,y)"))  # x=4,y=2 -> sqrt(20)
    assert got[1] == pytest.approx(math.hypot(4.0, 2.0))
    assert _vals(df, parse_function_query("sinh(1)"))[1] == pytest.approx(math.sinh(1))
    assert _vals(df, parse_function_query("cosh(1)"))[1] == pytest.approx(math.cosh(1))
    assert _vals(df, parse_function_query("tanh(1)"))[1] == pytest.approx(math.tanh(1))


def test_xor_top_field(spark, df):
    """xor() (ValueSourceParser.java addParser("xor"): true iff not
    all-true and not all-false), top() passthrough, field() front door."""
    assert _vals(df, parse_function_query("xor(true(),false())")) == {
        1: True, 2: True
    }
    assert _vals(df, parse_function_query("xor(true(),true())")) == {
        1: False, 2: False
    }
    assert _vals(df, parse_function_query("xor(false(),false(),false())")) == {
        1: False, 2: False
    }
    assert _vals(df, parse_function_query("xor(true(),true(),false())")) == {
        1: True, 2: True
    }
    a = _vals(df, parse_function_query("top(sum(1,2))"))
    assert a == {1: 3, 2: 3}
    assert _vals(df, parse_function_query("field(x)")) == _vals(
        df, parse_function_query("x")
    )
    assert _vals(df, parse_function_query('field("x")')) == _vals(
        df, parse_function_query("x")
    )


def test_query_value_source_requires_accumulator(spark, df):
    import pytest as _pt

    with _pt.raises(ValueError, match="accumulator"):
        parse_function_query("query('x')")
    with _pt.raises(ValueError, match="no request param"):
        parse_function_query("query($missing)", subqueries=[])


def test_query_value_source_end_to_end(spark, sf_dir):
    """{!func}sum(query($qq),0) == the subquery's own scored set with 0.0
    for misses; {!boost b=query($qq)} multiplies (QueryValueSource)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.driver_queries import get_index
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.qparsers import qparser_search

    index = get_index(spark, sf_dir)
    got = {
        r.docid: r.score
        for r in qparser_search(
            index, "{!func}query($qq)", k=1000, req={"qq": "table"}
        ).collect()
        if r.score != 0.0
    }
    want = {
        r.docid: r.score
        for r in search(index, "table", k=1000).collect()
    }
    assert got == want
    # boost composition: score(merge) * (1 + score(table))
    boosted = {
        r.docid: r.score
        for r in qparser_search(
            index,
            "{!boost b=sum(1,query($qq))}merge",
            k=1000,
            req={"qq": "table"},
        ).collect()
    }
    merge_raw = {
        r.docid: r.score
        for r in search(index, "merge", k=1000, round_dp=10).collect()
    }
    for docid, s in list(boosted.items())[:50]:
        expect = round(merge_raw[docid] * (1.0 + want.get(docid, 0.0)), 4)
        assert s == pytest.approx(expect, abs=1e-4), docid


def test_external_file_field(spark):
    from lucene_solr_spark.functions.value_sources import (
        parse_function_query,
        with_external_file,
    )

    docs = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "doc_id long, n_chars long"
    )
    eff = spark.createDataFrame(
        [(1, "2.5"), (3, "0.5")], "key long, value string"
    )
    out = with_external_file(docs, eff, default=1.0)
    got = {int(r.doc_id): float(r.eff) for r in out.collect()}
    assert got == {1: 2.5, 2: 1.0, 3: 0.5}
    # composes with the function registry: product(eff, n_chars)
    boosted = out.withColumn(
        "b", parse_function_query("product(eff,n_chars)")
    )
    bb = {int(r.doc_id): float(r.b) for r in boosted.collect()}
    assert bb == {1: 250.0, 2: 200.0, 3: 150.0}
