"""Result clustering (ClusteringComponent surface): structural invariants +
a pure-Python differential of the dominant-term labeling."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.clustering import cluster_results


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


def test_clusters_partition_the_window(index):
    """Every windowed doc lands in exactly one cluster; sizes sum to the
    number of labeled docs; ordering is (size desc, label asc)."""
    out = cluster_results(index, ["table", "merge"], rows=30).collect()
    assert out
    ids = [[int(d) for d in r.docids.split(",")] for r in out]
    all_docs = [d for row in ids for d in row]
    assert len(all_docs) == len(set(all_docs))
    assert all(r.size == len(row) for r, row in zip(out, ids))
    assert all(row == sorted(row) for row in ids)
    keys = [(-r.size, r.label) for r in out]
    assert keys == sorted(keys)
    # labels never echo the query terms (Carrot2 query-word suppression)
    assert all(r.label not in ("table", "merge") for r in out)


def test_labels_match_python_argmax(index):
    """Each doc's label is its max tf*idf non-query term, ties term-asc."""
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    qterms = ["table", "merge"]
    window = {
        r.docid
        for r in search(index, BooleanQuery.of(should=qterms), k=30).collect()
    }
    n = index.max_doc
    dfm = {r.term: r.df for r in index.term_stats().collect()}
    post = (
        index.postings.filter(F.col("docid").isin(list(window)))
        .select("docid", "term", "tf").collect()
    )
    best: dict[int, tuple] = {}
    for r in post:
        if r.term in qterms:
            continue
        w = r.tf * math.log(1.0 + (n - dfm[r.term] + 0.5) / (dfm[r.term] + 0.5))
        key = (-w, r.term)
        if r.docid not in best or key < best[r.docid]:
            best[r.docid] = key
    want: dict[int, str] = {d: k[1] for d, k in best.items()}

    got = {}
    for r in cluster_results(index, qterms, rows=30).collect():
        for d in r.docids.split(","):
            got[int(d)] = r.label
    assert got == want


def test_min_cluster_size_filters(index):
    full = cluster_results(index, ["table"], rows=30).collect()
    if all(r.size < 2 for r in full):
        pytest.skip("no multi-doc cluster at this sf")
    filt = cluster_results(index, ["table"], rows=30, min_cluster_size=2).collect()
    assert all(r.size >= 2 for r in filt)
    assert {r.label for r in filt} == {r.label for r in full if r.size >= 2}
