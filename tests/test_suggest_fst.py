"""FSTCompletionLookup bucket discretization + WFST exactFirst — pure-Python
oracle replicating FSTCompletionLookup.java:199-216's build loop exactly
(sort weight-asc, bucket = line*buckets/total, equal weights share the
run-start bucket), then compared to the one-window Spark implementation."""

import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.suggest import (
    fst_completion_lookup,
    suggest_prefix,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


def _java_buckets(pairs, buckets):
    """The FSTCompletionLookup build loop, verbatim semantics."""
    ordered = sorted(pairs, key=lambda p: (p[1], p[0]))  # weight asc, term asc
    total = len(ordered)
    out = {}
    prev_score = None
    prev_bucket = 0
    for line, (term, w) in enumerate(ordered):
        if line > 0 and w == prev_score:
            b = prev_bucket
        else:
            b = line * buckets // total
        prev_score, prev_bucket = w, b
        out[term] = b
    return out


def test_bucket_assignment_matches_java_loop(index):
    pairs = [(r.term, r.cf) for r in index.term_stats().collect()]
    want = _java_buckets(pairs, 10)
    got = {
        r.suggestion: r.bucket
        for r in fst_completion_lookup(index, "", k=10_000, buckets=10,
                                       exact_first=False).collect()
    }
    assert got == want


def test_lookup_order_bucket_desc_alpha_within(index):
    out = fst_completion_lookup(index, "s", k=100, exact_first=False).collect()
    keys = [(-r.bucket, r.suggestion) for r in out]
    assert keys == sorted(keys)
    assert all(r.suggestion.startswith("s") for r in out)


def test_exact_first_promotes_exact_match(index):
    """FSTCompletion.checkExistingAndReorder: the exact key jumps to the
    front even when lower-bucketed."""
    terms = {r.term for r in index.term_stats().collect()}
    # pick a term that is a strict prefix of another (exists in this vocab)
    cand = sorted(
        t for t in terms if any(u != t and u.startswith(t) for u in terms)
    )
    if not cand:
        pytest.skip("no nested prefix pair at this sf")
    key = cand[0]
    out = fst_completion_lookup(index, key, k=10, exact_first=True).collect()
    assert out[0].suggestion == key
    out2 = suggest_prefix(index, key, k=10, exact_first=True).collect()
    assert out2[0].suggestion == key


def test_wfst_exact_weight_order(index):
    """WFSTCompletionLookup: exact weights, weight-desc order (no
    discretization) — suggest_prefix's contract."""
    out = suggest_prefix(index, "s", k=100).collect()
    keys = [(-r.weight, r.suggestion) for r in out]
    assert keys == sorted(keys)
