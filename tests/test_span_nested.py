"""Nested ordered span-near: hand-checked example + brute-force differential."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.bm25 import _span_chain_ordered, span_near_nested_topk


def _brute_clause_spans(pos, clause):
    """Spans (start, end_exclusive) for one clause over {term: [positions]}."""
    if isinstance(clause, str):
        clause = [clause]
    if isinstance(clause, list):
        return sorted((p, p + 1) for t in clause for p in pos.get(t, []))
    if isinstance(clause, tuple) and clause[0] == "near":
        _, subs, slop = clause
        return sorted(
            (s, e) for s, e, ml in _brute_chain(pos, subs) if ml <= slop
        )
    raise TypeError(clause)


def _brute_chain(pos, clauses):
    """Forward-greedy ordered chain: anchors on clause-0 spans, takes the
    (start, end)-minimal next span with start >= prev end; ml = gap sum."""
    out = []
    for s, e in _brute_clause_spans(pos, clauses[0]):
        end, ml, ok = e, 0, True
        for c in clauses[1:]:
            cand = [sp for sp in _brute_clause_spans(pos, c) if sp[0] >= end]
            if not cand:
                ok = False
                break
            qs, qe = min(cand)
            ml += qs - end
            end = qe
        if ok:
            out.append((s, end, ml))
    return out


@pytest.fixture(scope="module")
def nested_corpus(spark):
    rng = random.Random(1807)
    vocab = ["alpha", "beta", "gamma", "delta", "omega"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=3, persist=False, build_positions=True,
    )
    return idx, {i: {t: [j for j, w in enumerate(txt.split()) if w == t]
                     for t in vocab}
                 for i, txt in rows}


TREES = [
    ["alpha", ("near", ["beta", "gamma"], 1)],
    [("near", ["alpha", "beta"], 0), "gamma"],
    [("near", ["alpha", "beta"], 2), ("near", ["gamma", "delta"], 2)],
    [["alpha", "omega"], ("near", ["beta", ["gamma", "delta"]], 1)],
    ["alpha", ("near", ["beta", ("near", ["gamma", "delta"], 3)], 4)],
]


@pytest.mark.parametrize("tree", TREES)
def test_nested_chain_matches_brute_force(nested_corpus, tree):
    idx, posmap = nested_corpus
    got = {
        (r.docid, r._start, r._end, r._ml)
        for r in _span_chain_ordered(idx, tree).collect()
    }
    want = {
        (d, s, e, ml)
        for d, pos in posmap.items()
        for s, e, ml in _brute_chain(pos, tree)
    }
    assert got == want


def test_nested_hand_example(spark):
    rows = [
        (0, "filter then table scan ends"),  # inner [2,4) ml 0; outer ml 1
        (1, "filter table scan"),            # outer ml 0
        (2, "table scan filter"),            # wrong order
        (3, "filter table x scan"),          # inner ml 1 (= slop); outer ml 0
        (4, "filter table x x scan"),        # inner ml 2 > 1
        (5, "filter x x x table scan"),      # outer ml 3 > 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False, build_positions=True,
    )
    tree = ["filter", ("near", ["table", "scan"], 1)]
    out = span_near_nested_topk(idx, tree, slop=2)
    assert {r.docid for r in out.collect()} == {0, 1, 3}
    chain = {
        r.docid: (r._start, r._end, r._ml)
        for r in _span_chain_ordered(idx, tree).collect()
    }
    assert chain[0] == (0, 4, 1)
    assert chain[1] == (0, 3, 0)
    assert chain[3] == (0, 4, 0)
    assert 4 not in chain and 2 not in chain
    assert chain[5][2] == 3  # present in the chain, filtered by outer slop


# -- unordered (NearSpansUnordered enumeration) --------------------------------

def _java_shape_unordered(cell_lists, slop):
    """Transcription-shaped reimplementation of NearSpansUnordered.next()
    (NearSpansUnordered.java:180-233): a priority queue of cells ordered by
    docSpansOrdered; after the first configuration, each next() advances the
    queue top then scans forward to the next atMatch.  Differential partner
    for the production walk (which is an argmin loop, not a heap)."""
    import heapq

    k = len(cell_lists)
    heap = [(cl[0][0], cl[0][1], ci, 0) for ci, cl in enumerate(cell_lists)]
    heapq.heapify(heap)
    ends = {ci: cl[0][1] for ci, cl in enumerate(cell_lists)}
    lens = {ci: cl[0][1] - cl[0][0] for ci, cl in enumerate(cell_lists)}
    matches = []
    first = True
    while True:
        if not first:
            s, e, ci, i = heapq.heappop(heap)
            i += 1
            if i >= len(cell_lists[ci]):
                break
            ns, ne = cell_lists[ci][i]
            ends[ci], lens[ci] = ne, ne - ns
            heapq.heappush(heap, (ns, ne, ci, i))
        first = False
        lo = heap[0][0]
        hi = max(ends.values())
        total = sum(lens.values())
        ml = hi - lo - total
        if ml <= slop:
            matches.append((lo, hi, ml))
    return sorted(matches)


def test_unordered_walk_matches_java_shape():
    import random

    from lucene_solr_spark.search.bm25 import near_spans_unordered_matches

    rng = random.Random(42)
    for _ in range(300):
        k = rng.randint(2, 4)
        cells = []
        for _ in range(k):
            n = rng.randint(1, 6)
            starts = sorted(rng.sample(range(0, 25), n))
            cells.append([(s, s + rng.randint(1, 3)) for s in starts])
            cells[-1].sort()
        slop = rng.randint(0, 6)
        assert near_spans_unordered_matches(cells, slop) == _java_shape_unordered(
            cells, slop
        )


def test_unordered_hand_golden_b_a_b(spark):
    """'b a b': the walk yields TWO slop-0 matches — the behavior the
    anchor-form kernel (one per anchor) cannot express."""
    from lucene_solr_spark.search.bm25 import (
        near_spans_unordered_matches,
        span_near_unordered_topk,
    )

    assert near_spans_unordered_matches(
        [[(1, 2)], [(0, 1), (2, 3)]], 0
    ) == [(0, 2, 0), (1, 3, 0)]

    docs = spark.createDataFrame(
        [(0, "beta alpha beta"), (1, "alpha beta"), (2, "alpha omega")],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False, build_positions=True,
    )
    out = {r.docid: r.score for r in
           span_near_unordered_topk(idx, ["alpha", "beta"], slop=0).collect()}
    assert set(out) == {0, 1}
    assert out[0] > out[1]  # doc 0 has sloppyFreq 2 vs doc 1's 1


def test_unordered_superset_of_ordered(nested_corpus):
    from lucene_solr_spark.search.bm25 import (
        span_near_nested_topk,
        span_near_unordered_topk,
    )

    idx, _ = nested_corpus
    tree = ["alpha", ("near", ["beta", "gamma"], 1)]
    ordered = {r.docid for r in span_near_nested_topk(idx, tree, slop=2).collect()}
    unordered = {
        r.docid for r in span_near_unordered_topk(idx, tree, slop=2).collect()
    }
    assert ordered <= unordered


def test_unordered_nested_unear_and_slop_monotonic(nested_corpus):
    from lucene_solr_spark.search.bm25 import span_near_unordered_topk

    idx, _ = nested_corpus
    tree = [("unear", ["alpha", "beta"], 1), ["gamma", "delta"]]
    prev: set = set()
    for slop in (0, 2, 5):
        got = {
            r.docid
            for r in span_near_unordered_topk(idx, tree, slop=slop).collect()
        }
        assert prev <= got
        prev = got
