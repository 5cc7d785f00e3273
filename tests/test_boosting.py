"""BoostingQuery / CustomScoreQuery differentials vs OracleIndex-based
pure-Python mirrors (BoostingQuery.java coord override,
CustomScoreProvider.java default multiply)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.boosting import (
    boosting_query_topk,
    custom_score_topk,
)
from lucene_solr_spark.search.query import BooleanQuery
from tests.oracle_py import OracleIndex


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    out = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "n_chars").collect()
    )
    return [(int(r.doc_id), r.text, int(r.n_chars)) for r in out]


@pytest.fixture(scope="module")
def oracle(rows):
    return OracleIndex([(d, t) for d, t, _ in rows])


def _py_boosting(oracle, should, context, boost, k=10):
    base = oracle.topk(should=should, k=10**9)
    out = []
    for d, s in base:
        s4 = round(s, 4)
        if any(oracle.tf[d].get(t) for t in context):
            s4 = round(s4 * boost, 4)
        out.append((d, s4))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_boosting_demotes_context(index, oracle):
    got = [
        (int(r.docid), float(r.score))
        for r in boosting_query_topk(
            index, BooleanQuery.of(should=["table", "merge"]), ["slow"], 0.2
        ).collect()
    ]
    want = _py_boosting(oracle, ["table", "merge"], ["slow"], 0.2)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-3, (gd, gs, ws)


def test_boosting_promotes_with_gt1(index, oracle):
    got = [
        (int(r.docid), float(r.score))
        for r in boosting_query_topk(
            index, BooleanQuery.of(should=["table"]), ["merge"], 3.0
        ).collect()
    ]
    want = _py_boosting(oracle, ["table"], ["merge"], 3.0)
    assert [d for d, _ in got] == [d for d, _ in want]


def _py_custom(oracle, nchars, should, vs_fn, k=10):
    base = oracle.topk(should=should, k=10**9)
    out = []
    for d, s in base:
        out.append((d, round(round(s, 4) * vs_fn(nchars[d]), 4)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_custom_score_multiplies_value_source(index, rows, oracle, spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("docid"), "n_chars")
    )
    got = [
        (int(r.docid), float(r.score))
        for r in custom_score_topk(
            index, docs, BooleanQuery.of(should=["vector", "stream"]),
            ["sqrt(n_chars)"],
        ).collect()
    ]
    nchars = {d: n for d, _, n in rows}
    want = _py_custom(oracle, nchars, ["vector", "stream"], math.sqrt)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-3 * max(1.0, abs(ws)), (gd, gs, ws)


def test_custom_score_two_sources(index, rows, oracle, spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("docid"), "n_chars")
    )
    got = [
        (int(r.docid), float(r.score))
        for r in custom_score_topk(
            index, docs, BooleanQuery.of(should=["vector"]),
            ["sqrt(n_chars)", "recip(n_chars,1,1000,1000)"],
        ).collect()
    ]
    nchars = {d: n for d, _, n in rows}
    want = _py_custom(
        oracle, nchars, ["vector"],
        lambda n: math.sqrt(n) * (1000.0 / (1.0 * n + 1000.0)),
    )
    assert [d for d, _ in got] == [d for d, _ in want]
