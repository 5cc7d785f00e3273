"""DebugComponent explain: the decomposition must reproduce the engine's
ranked score exactly and factor as idf * tfNorm
(BM25Similarity.java:296-330)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.explain import explain_scores


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    from lucene_solr_spark.driver_queries import get_index

    return get_index(spark, sf_dir)


def test_score_column_is_bit_identical_to_term_scores(index):
    from lucene_solr_spark.search.bm25 import term_scores

    ex = explain_scores(index, ["table", "merge"]).collect()
    ranked = {
        (r.docid, r.term): r.score
        for r in term_scores(index, ["table", "merge"]).collect()
    }
    assert len(ex) == len(ranked)
    for r in ex:
        assert r.score == ranked[(r.docid, r.term)]  # same formula TEXT


def test_factors_multiply_to_score(index):
    for r in explain_scores(index, ["table"], docids=[0, 1, 2, 3, 4]).collect():
        assert r.idf * r.tf_norm == pytest.approx(r.score, rel=1e-12)


def test_statistics_match_index_tables(index):
    stats = {r.term: r.df for r in index.term_stats().collect()}
    rows = explain_scores(index, ["table", "merge"], docids=[0, 1]).collect()
    post = {
        (r.docid, r.term): r.tf
        for r in index.postings.filter(
            F.col("term").isin(["table", "merge"]) & F.col("docid").isin([0, 1])
        ).collect()
    }
    assert {(r.docid, r.term) for r in rows} == set(post)
    for r in rows:
        assert r.tf == post[(r.docid, r.term)]
        assert r.df == stats[r.term]


def test_empty_terms_raise(index):
    with pytest.raises(ValueError):
        explain_scores(index, [])
