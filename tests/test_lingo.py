"""Lingo clustering: determinism + structural invariants of the SVD label
induction, and the Spark wrapper differential against the pure function."""

import numpy as np
import pytest

from lucene_solr_spark.search.lingo import _tfidf_matrix, lingo
from lucene_solr_spark.search.stc import _sentences

TWO_TOPICS = [
    (1, "solar panel energy. solar panel energy output"),
    (2, "solar panel energy storage"),
    (3, "solar panel installation"),
    (4, "quantum computer hardware. quantum computer hardware design"),
    (5, "quantum computer hardware lab"),
    (6, "quantum computer simulation"),
]


def test_tfidf_matrix_shape_and_normalization():
    doc_sents = {d: _sentences(t) for d, t in TWO_TOPICS}
    terms, docids, A = _tfidf_matrix(doc_sents)
    assert docids == [1, 2, 3, 4, 5, 6]
    # only terms in >=2 docs survive; stopwords never appear
    assert "solar" in terms and "quantum" in terms
    assert "storage" not in terms  # df=1
    for j in range(A.shape[1]):
        n = np.linalg.norm(A[:, j])
        assert n == pytest.approx(1.0) or n == 0.0


def test_two_topics_separate():
    out = lingo(TWO_TOPICS)
    labels = [c for c in out if c["label"] != "Other Topics"]
    assert len(labels) >= 2
    solar = next(c for c in labels if "solar" in c["label"])
    quantum = next(c for c in labels if "quantum" in c["label"])
    assert set(solar["docids"]) <= {1, 2, 3}
    assert set(quantum["docids"]) <= {4, 5, 6}
    assert all(0.0 < c["score"] <= 1.0 for c in labels)


def test_phrase_labels_preferred_over_single_terms():
    """The frequent phrase 'solar panel' / 'quantum computer' (a suffix-tree
    node) matches the topic concept better than any single term."""
    out = lingo(TWO_TOPICS)
    labels = {c["label"] for c in out}
    assert any(" " in l for l in labels if l != "Other Topics")


def test_deterministic():
    a = lingo(TWO_TOPICS)
    b = lingo(TWO_TOPICS)
    assert a == b


def test_all_docs_accounted_for():
    out = lingo(TWO_TOPICS)
    covered = set()
    for c in out:
        covered.update(c["docids"])
    assert covered == {1, 2, 3, 4, 5, 6}


def test_degenerate_single_doc():
    out = lingo([(7, "lonely text")])
    assert out == [
        {"label": "Other Topics", "size": 1, "docids": [7], "score": 0.0}
    ]


def test_empty_window():
    assert lingo([]) == []


@pytest.mark.usefixtures("spark")
class TestSparkWrapper:
    def test_wrapper_matches_pure_python(self, spark, sf_dir):
        from lucene_solr_spark.index.builder import build_index
        from lucene_solr_spark.search.bm25 import search
        from lucene_solr_spark.search.lingo import cluster_results_lingo
        from lucene_solr_spark.search.query import BooleanQuery

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = build_index(
            spark, docs, key_col="doc_id", docid_col="doc_id",
            num_index_partitions=8,
        )
        out = cluster_results_lingo(
            idx, docs, ["table", "merge"], rows=30, id_col="doc_id"
        ).collect()
        window = {
            r.docid for r in search(
                idx, BooleanQuery.of(should=["table", "merge"]), k=30
            ).collect()
        }
        page = sorted(
            (r["doc_id"], r["text"]) for r in docs.collect()
            if r["doc_id"] in window
        )
        expect = lingo(page)
        got = [
            {"label": r.label, "size": r.size, "docids": list(r.docids),
             "score": r.score}
            for r in out
        ]
        assert got == expect
        for c in got:
            assert set(c["docids"]) <= window
