"""Suffix Tree Clustering: hand-derived goldens for the base-cluster
(suffix-tree-node) semantics and the merge phase, plus the Spark wrapper's
window invariants.

Golden corpus = the Zamir & Etzioni running example (SIGIR '98 §4.1):
  d1: "cat ate cheese"
  d2: "mouse ate cheese too"
  d3: "cat mouse ate cheese too"

Internal nodes of the generalized suffix tree with unique per-sentence
terminators (hand-derived, continuation sets in comments):
  ("cat",)                       {1,3}   conts {ate, mouse}
  ("cheese",)                    {1,2,3} conts {$d1, too}
  ("ate","cheese")               {1,2,3} conts {$d1, too}
  ("too",)                       {2,3}   conts {$d2, $d3}
  ("cheese","too")               {2,3}   conts {$d2, $d3}
  ("ate","cheese","too")         {2,3}   conts {$d2, $d3}
  ("mouse","ate","cheese","too") {2,3}   conts {$d2, $d3}
NOT nodes (path compression — all occurrences share one continuation):
  ("ate",)->cheese, ("mouse",)->ate, ("mouse","ate")->cheese,
  ("mouse","ate","cheese")->too, and every 1-occurrence phrase.
"""

import pytest

from lucene_solr_spark.search.stc import stc, stc_base_clusters, _sentences

D1 = "cat ate cheese"
D2 = "mouse ate cheese too"
D3 = "cat mouse ate cheese too"
SENTS = {1: _sentences(D1), 2: _sentences(D2), 3: _sentences(D3)}


def test_base_clusters_are_suffix_tree_nodes():
    bases = stc_base_clusters(SENTS, min_base_score=0.0)
    got = {b.phrase: set(b.docids) for b in bases}
    assert got == {
        ("cat",): {1, 3},
        ("cheese",): {1, 2, 3},
        ("ate", "cheese"): {1, 2, 3},
        ("too",): {2, 3},
        ("cheese", "too"): {2, 3},
        ("ate", "cheese", "too"): {2, 3},
        ("mouse", "ate", "cheese", "too"): {2, 3},
    }


def test_base_cluster_scores():
    """s(B) = |B| * f(|P|): f=0.5 single word, f=|P| for 2..6."""
    bases = {b.phrase: b.score for b in stc_base_clusters(SENTS, min_base_score=0.0)}
    assert bases[("cat",)] == 2 * 0.5
    assert bases[("cheese",)] == 3 * 0.5
    assert bases[("ate", "cheese")] == 3 * 2.0
    assert bases[("cheese", "too")] == 2 * 2.0
    assert bases[("ate", "cheese", "too")] == 2 * 3.0
    assert bases[("mouse", "ate", "cheese", "too")] == 2 * 4.0


def test_min_base_score_gate_drops_single_words():
    phrases = {b.phrase for b in stc_base_clusters(SENTS)}  # default gate 2.0
    assert ("cat",) not in phrases and ("cheese",) not in phrases
    assert ("ate", "cheese") in phrases


def test_merge_single_component_golden():
    """All four surviving bases overlap >0.6 both ways -> ONE cluster whose
    label is the top-scoring base phrase and score the member sum."""
    out = stc([(1, D1), (2, D2), (3, D3)])
    assert out[0]["label"] == "mouse ate cheese too"
    assert out[0]["docids"] == [1, 2, 3]
    assert out[0]["score"] == pytest.approx(6.0 + 4.0 + 6.0 + 8.0)
    assert [c["label"] for c in out[1:]] == []  # no uncovered docs


def test_merge_threshold_separates_topics():
    docs = [
        (1, "alpha beta gamma. alpha beta gamma"),
        (2, "alpha beta gamma delta"),
        (3, "red fish blue fish. red fish blue fish"),
        (4, "red fish blue fish swim"),
    ]
    out = stc(docs)
    labels = {c["label"]: c for c in out if c["label"] != "Other Topics"}
    assert any("alpha beta gamma" in l for l in labels)
    assert any("red fish blue fish" in l for l in labels)
    for c in labels.values():
        assert set(c["docids"]) in ({1, 2}, {3, 4})


def test_stopwords_never_edge_a_label_and_dont_count():
    docs = [
        (1, "the quick fox of the forest"),
        (2, "the quick fox of the meadow"),
    ]
    bases = stc_base_clusters(
        {d: _sentences(t) for d, t in docs}, min_base_score=0.0
    )
    for b in bases:
        assert b.phrase[0] not in ("the", "of") and b.phrase[-1] not in ("the", "of")
    by_phrase = {b.phrase: b.score for b in bases}
    # "quick fox of the" trimmed variants: the right-maximal label candidate
    # containing the stop run is ("quick", "fox") — eff len 2
    assert by_phrase[("quick", "fox")] == 2 * 2.0


def test_other_topics_collects_uncovered_docs():
    docs = [
        (1, "shared phrase here"),
        (2, "shared phrase here"),
        (3, "utterly unrelated singleton text"),
    ]
    out = stc(docs)
    assert out[-1]["label"] == "Other Topics"
    assert out[-1]["docids"] == [3]
    assert out[-1]["score"] == 0.0


def test_sentence_boundaries_block_phrases():
    """Phrases never span a sentence split."""
    docs = {1: _sentences("alpha beta. gamma delta"), 2: _sentences("alpha beta gamma delta")}
    phrases = {b.phrase for b in stc_base_clusters(docs, min_base_score=0.0)}
    assert ("beta", "gamma") not in phrases


@pytest.mark.usefixtures("spark")
class TestSparkWrapper:
    @pytest.fixture(scope="class")
    def index_and_docs(self, spark, sf_dir):
        from lucene_solr_spark.index.builder import build_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = build_index(
            spark, docs, key_col="doc_id", docid_col="doc_id",
            num_index_partitions=8,
        )
        return idx, docs

    def test_wrapper_matches_pure_python(self, spark, index_and_docs):
        from lucene_solr_spark.search.bm25 import search
        from lucene_solr_spark.search.query import BooleanQuery
        from lucene_solr_spark.search.stc import cluster_results_stc

        idx, docs = index_and_docs
        out = cluster_results_stc(
            idx, docs, ["table", "merge"], rows=30, id_col="doc_id"
        ).collect()
        window = {
            r.docid for r in search(
                idx, BooleanQuery.of(should=["table", "merge"]), k=30
            ).collect()
        }
        page = [
            (r["doc_id"], r["text"])
            for r in docs.collect()
            if r["doc_id"] in window
        ]
        expect = stc(sorted(page))
        got = [
            {"label": r.label, "size": r.size, "docids": list(r.docids),
             "score": r.score}
            for r in out
        ]
        assert got == expect
        # window coverage: every clustered doc came from the window
        for c in got:
            assert set(c["docids"]) <= window
