"""SpanPositionRangeQuery / SpanFirstQuery: differential vs a pure-Python
positions oracle (SpanPositionRangeQuery.java:42-50, SpanFirstQuery.java:
40-48 — start()/end() gates with Lucene's exclusive end)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import analyze_text_positions
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.bm25 import (
    span_first_topk,
    span_position_range_topk,
)
from tests.oracle_py import OracleIndex


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, build_positions=True,
    )


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    out = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    return [(int(r.doc_id), r.text) for r in out]


@pytest.fixture(scope="module")
def oracle(rows):
    return OracleIndex(rows)


def _positions(rows):
    """token position lists per (docid, term), matching the engine's
    stop-gap (pre-filter) position semantics via the shared analyzer."""
    pos: dict[int, dict[str, list[int]]] = {}
    for docid, text in rows:
        d = pos.setdefault(docid, {})
        for p, t in analyze_text_positions(text):
            d.setdefault(t, []).append(p)
    return pos


def _py_single_term(rows, oracle, term, start, end, k=10):
    pos = _positions(rows)
    hits = []
    for docid, _ in rows:
        ps = pos.get(docid, {}).get(term, [])
        tf = sum(1 for p in ps if p >= start and p + 1 <= end)
        if tf == 0:
            continue
        dl = oracle.dl_approx[docid]
        s = oracle.idf(term) * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl / oracle.avgdl))
        hits.append((docid, round(s, 4)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def _py_ordered_pair(rows, oracle, t0, t1, start, end, slop, k=10):
    """anchor form: for each p0, the NEXT t1 position; ml = e - p0 - 1."""
    pos = _positions(rows)
    hits = []
    for docid, _ in rows:
        d = pos.get(docid, {})
        p0s, p1s = d.get(t0, []), d.get(t1, [])
        tf = 0.0
        for p0 in p0s:
            nxt = [e for e in p1s if e > p0]
            if not nxt:
                continue
            e = min(nxt)
            ml = e - p0 - 1
            if ml <= slop and p0 >= start and e + 1 <= end:
                tf += 1.0 / (1 + ml)
        if tf == 0:
            continue
        dl = oracle.dl_approx[docid]
        idf = oracle.idf(t0) + oracle.idf(t1)
        s = idf * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl / oracle.avgdl))
        hits.append((docid, round(s, 4)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def _got(df, k=10):
    return [
        (int(r.docid), float(r.score))
        for r in df.orderBy(df.score.desc(), df.docid.asc()).limit(k).collect()
    ]


def test_span_first_single_term(index, rows, oracle):
    got = _got(span_first_topk(index, ["table"], end=10))
    want = _py_single_term(rows, oracle, "table", 0, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-3, (gd, gs, ws)


def test_span_first_tightens_with_end(index, rows, oracle):
    wide = _got(span_first_topk(index, ["table"], end=1000), k=100)
    tight = _got(span_first_topk(index, ["table"], end=3), k=100)
    assert len(tight) <= len(wide)
    want = _py_single_term(rows, oracle, "table", 0, 3, k=100)
    assert [d for d, _ in tight] == [d for d, _ in want]


def test_span_position_range_start_gate(index, rows, oracle):
    got = _got(span_position_range_topk(index, ["table"], start=5, end=25))
    want = _py_single_term(rows, oracle, "table", 5, 25)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_span_position_range_ordered_pair(index, rows, oracle):
    got = _got(
        span_position_range_topk(
            index, ["table", "scan"], start=0, end=15, slop=1
        )
    )
    want = _py_ordered_pair(rows, oracle, "table", "scan", 0, 15, 1)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-3, (gd, gs, ws)


def test_span_multi_term_wrapper(index, rows, oracle):
    """SpanMultiTermQueryWrapper: prefix-expanded span-or equals span_or
    over the dictionary expansion (total-occurrence tf, one idf sum)."""
    from lucene_solr_spark.search.bm25 import span_multi_term_topk, span_or_topk
    from lucene_solr_spark.search.query import PrefixQuery

    got = [
        (int(r.docid), float(r.score))
        for r in span_multi_term_topk(index, PrefixQuery("sc"))
        .orderBy(F.desc("score"), F.asc("docid")).limit(10).collect()
    ]
    exp_terms = sorted({t for _, text in rows for t in _positions(rows).get(0, {})})
    # independent expansion: all analyzed dictionary terms starting with 'sc'
    vocab = sorted({t for d in _positions(rows).values() for t in d})
    expansion = [t for t in vocab if t.startswith("sc")]
    want = [
        (int(r.docid), float(r.score))
        for r in span_or_topk(index, expansion)
        .orderBy(F.desc("score"), F.asc("docid")).limit(10).collect()
    ]
    assert got == want and got
