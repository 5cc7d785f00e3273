"""TermVectorComponent analog: per-doc term vectors vs the index tables they
derive from (TermVectorComponent.java:83-400)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.termvectors import term_vectors


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    from lucene_solr_spark.driver_queries import get_index

    return get_index(spark, sf_dir)


def test_tf_matches_postings(index):
    tv = term_vectors(index, [0, 1], positions=False, df=False).collect()
    post = {
        (r.docid, r.term): r.tf
        for r in index.postings.filter(F.col("docid").isin([0, 1])).collect()
    }
    assert len(tv) == len(post)
    for r in tv:
        assert post[(r.docid, r.term)] == r.tf


def test_positions_are_sorted_and_match_tf(index):
    tv = term_vectors(index, [0], tf=True, positions=True, df=False).collect()
    assert tv
    for r in tv:
        assert list(r.positions) == sorted(r.positions)
        assert len(r.positions) == r.tf  # freq == number of positions emitted


def test_df_and_tf_idf_ratio(index):
    tv = term_vectors(index, [0, 1], df=True, tf_idf=True).collect()
    stats = {
        r.term: r.df
        for r in index.term_stats()
        .filter(F.col("term").isin([r.term for r in tv]))
        .collect()
    }
    for r in tv:
        assert r.df == stats[r.term]
        # TermVectorComponent.java:396-400: tfIdfVal = (double) freq / df
        assert r.tf_idf == pytest.approx(r.tf / r.df)


def test_output_is_doc_then_term_ordered(index):
    rows = [(r.docid, r.term) for r in term_vectors(index, [1, 0]).collect()]
    assert rows == sorted(rows)


def test_empty_docids_raise(index):
    with pytest.raises(ValueError):
        term_vectors(index, [])
