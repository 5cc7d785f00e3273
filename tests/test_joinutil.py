"""JoinUtil score modes: differential vs Python aggregation over the
OracleIndex-scored from set (TermsWithScoreCollector.java:96-140)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.joinutil import join_util
from tests.oracle_py import OracleIndex


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "source").collect()
    )
    oracle = OracleIndex([(int(r.doc_id), r.text) for r in rows])
    src = {int(r.doc_id): r.source for r in rows}
    return oracle, src


@pytest.fixture(scope="module")
def vals(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("long").alias("docid"),
        F.col("source").alias("joinval"),
    )


def _py_join(oracle, src, term, mode, k=None):
    per_val: dict[str, list[float]] = {}
    for d, c in oracle.tf.items():
        s = oracle.term_score(d, term)
        if s is not None:
            per_val.setdefault(src[d], []).append(round(s, 4))
    agg = {}
    for v, ss in per_val.items():
        ss.sort()
        if mode == "max":
            agg[v] = max(ss)
        elif mode == "total":
            t = 0.0
            for x in ss:
                t = t + x
            agg[v] = t
        elif mode == "avg":
            t = 0.0
            for x in ss:
                t = t + x
            agg[v] = t / len(ss)
        else:
            agg[v] = 1.0
    out = [
        (d, round(agg[src[d]], 4)) for d in oracle.tf if src[d] in agg
    ]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k] if k else out


@pytest.mark.parametrize("mode", ["max", "total", "avg", "none"])
def test_join_util_modes(index, corpus, vals, mode):
    from lucene_solr_spark.search.bm25 import term_scores

    oracle, src = corpus
    scored = term_scores(index, ["table"]).select(
        "docid", F.round("score", 4).alias("score")
    )
    got = [
        (int(r.docid), float(r.score))
        for r in join_util(scored, vals, vals, mode).limit(40).collect()
    ]
    want = _py_join(oracle, src, "table", mode, k=40)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6 * max(1.0, abs(ws)), (gd, gs, ws)
