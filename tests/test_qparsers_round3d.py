"""Round-3d QParser front doors: func, lucenePlusSort, dismax, edismax,
rerank — closing the QParserPlugin.standardPlugins registry
(solr/core/src/java/org/apache/solr/search/QParserPlugin.java:40-67).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.qparsers import qparser_search


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (0, "grand table scan plan", "en", 40),
            (1, "table merge plan", "de", 10),
            (2, "stream hash join", "en", 30),
            (3, "table stream scan", "fr", 20),
        ],
        "doc_id long, text string, lang string, n_chars int",
    )
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, passthrough_cols=("lang", "n_chars"),
    )


@pytest.fixture(scope="module")
def mfi(spark):
    from lucene_solr_spark.index.fields import build_multifield_index

    docs = spark.createDataFrame(
        [
            (0, "spark engine", "the spark execution engine guide"),
            (1, "query planner", "spark catalyst planner internals"),
            (2, "spark spark", "unrelated body text"),
        ],
        "doc_id long, title string, body string",
    )
    return build_multifield_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        field_exprs={"title": "title", "body": "body"},
        default_field="body", num_index_partitions=2,
    )


def test_func_qparser(idx):
    # FunctionQuery: score IS the function value over docvalues columns
    rows = qparser_search(idx, "{!func}div(n_chars,10)", k=3).collect()
    assert [(r.docid, r.score) for r in rows] == [(0, 4.0), (2, 3.0), (3, 2.0)]


def test_lucene_plus_sort_qparser(idx):
    # 'query; sort' deprecated syntax: matches 'table', emitted by n_chars asc
    rows = qparser_search(idx, "{!lucenePlusSort}table; n_chars asc", k=10).collect()
    assert [r.docid for r in rows] == [1, 3, 0]
    # no ';' -> plain lucene
    plain = qparser_search(idx, "{!lucenePlusSort}table", k=10).collect()
    assert len(plain) == 3
    # {!old} is the OldLuceneQParserPlugin legacy alias: same parser —
    # with it, all 27 standardPlugins names resolve
    legacy = qparser_search(idx, "{!old}table; n_chars asc", k=10).collect()
    assert [r.docid for r in legacy] == [1, 3, 0]


def test_dismax_qparser(mfi):
    rows = qparser_search(mfi, '{!dismax qf="title^2 body"}spark', k=3).collect()
    # doc2 has tf=2 in title (boost 2) -> must rank first
    assert rows[0].docid == 2
    assert len(rows) == 3


def test_dismax_requires_multifield(idx, mfi):
    with pytest.raises(ValueError, match="MultiFieldIndex"):
        qparser_search(idx, '{!dismax qf="text"}table', k=3)
    with pytest.raises(ValueError, match="qf"):
        qparser_search(mfi, "{!dismax}spark", k=3)


def test_edismax_qparser_mm(mfi):
    # mm=100% demands both terms somewhere in qf fields
    rows = qparser_search(
        mfi, '{!edismax qf="title body" mm=100%}spark planner', k=5
    ).collect()
    assert [r.docid for r in rows] == [1]


def test_rerank_qparser(idx):
    main = qparser_search(idx, "{!rerank reRankQuery=stream reRankWeight=10}table", k=3)
    rows = main.collect()
    # docs 1,3,0 match 'table'; doc3 also matches 'stream' -> boosted to top
    assert rows[0].docid == 3
    # matches the direct rerank() API
    from lucene_solr_spark.search.bm25 import rerank

    direct = rerank(idx, ["table"], ["stream"], rerank_weight=10.0, k=3).collect()
    assert [(r.docid, r.score) for r in rows] == [
        (r.docid, r.rerank_score) for r in direct
    ]
