"""MultiPhraseQuery + hasMultiTermRpts sloppy machinery: hand-executed
SloppyPhraseScorer goldens (incl. the initFirstTime Javadoc's hidden-
collision example), kernel differentials, and end-to-end consistency with
the single-term phrase path."""

import random

import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.bm25 import (
    lucene_sloppy_freq,
    lucene_sloppy_freq_mtp,
    lucene_sloppy_freq_rpts,
    multiphrase_repeat_groups,
    multiphrase_topk,
    sloppy_phrase_lucene_topk,
)
from lucene_solr_spark.search.query import MultiPhraseQuery, PhraseQuery


# --- group detection (gatherRptGroups, MTP flavor) ---

def test_groups_no_repeats():
    groups, mtp = multiphrase_repeat_groups([["a", "b"], ["c"]])
    assert groups == [-1, -1] and not mtp


def test_groups_single_term_repeats():
    groups, mtp = multiphrase_repeat_groups([["a"], ["b"], ["a"]])
    assert groups == [0, -1, 0] and not mtp


def test_groups_mtp_connected():
    # hidden collision: {a,b} and {b,c} connect through b
    groups, mtp = multiphrase_repeat_groups([["a", "b"], ["b", "c"]])
    assert groups == [0, 0] and mtp


def test_groups_two_components():
    groups, mtp = multiphrase_repeat_groups(
        [["a"], ["a"], ["x", "y"], ["y"]]
    )
    assert groups[0] == groups[1] and groups[2] == groups[3]
    assert groups[0] != groups[2] and mtp


# --- MTP kernel goldens (hand-executed SloppyPhraseScorer) ---

def test_mtp_hidden_collision_doc_acb():
    """Doc 'a c b', slots {a,b} {b,c} (initFirstTime Javadoc example):
    exact match (a,c); the greedy loop then collides both slots on b@2 and
    exhausts after scoring matchLength 2."""
    s0 = [0, 2]   # union(a@0, b@2) - offset 0
    s1 = [0, 1]   # union(c@1, b@2) - offset 1
    groups = [0, 0]
    assert lucene_sloppy_freq_mtp([list(s0), list(s1)], groups, 0) == 1.0
    assert lucene_sloppy_freq_mtp([list(s0), list(s1)], groups, 1) == 1.0
    assert lucene_sloppy_freq_mtp([list(s0), list(s1)], groups, 2) == pytest.approx(1.0 + 1.0 / 3)


def test_mtp_init_collision_resolved():
    """Doc 'a b', slots {a,b} {a,b}: init places both on raw 0 and the
    MTP init advances the higher-offset slot; one exact match."""
    s0 = [0, 1]
    s1 = [-1, 0]
    assert lucene_sloppy_freq_mtp([list(s0), list(s1)], [0, 0], 0) == 1.0


def test_mtp_single_position_each_no_match():
    """Slots {a,b} {a,b} over doc 'a': both streams have one position at the
    same raw token — init collision cannot resolve, freq 0."""
    assert lucene_sloppy_freq_mtp([[0], [-1]], [0, 0], 10) == 0.0


def test_mtp_matches_rpts_on_single_term_slots():
    """With single-term slots the MTP kernel must equal the non-MTP repeats
    kernel (same main loop; init j-advances == iterative collide-resolve)."""
    rng = random.Random(42)
    for _ in range(400):
        k = rng.randint(2, 4)
        n_terms = rng.randint(1, 2)
        slot_term = [rng.randrange(n_terms) for _ in range(k)]
        term_pos = {
            t: sorted(rng.sample(range(0, 25), rng.randint(1, 7)))
            for t in set(slot_term)
        }
        streams = [[p - i for p in term_pos[slot_term[i]]] for i in range(k)]
        counts = {t: slot_term.count(t) for t in set(slot_term)}
        groups = [
            slot_term[i] if counts[slot_term[i]] > 1 else -1 for i in range(k)
        ]
        # normalize group ids to 0..n like multiphrase_repeat_groups emits
        for slop in range(0, 5):
            a = lucene_sloppy_freq_mtp(
                [list(s) for s in streams], list(groups), slop
            )
            b = lucene_sloppy_freq_rpts(
                [list(s) for s in streams], list(groups), slop
            )
            assert a == b, (streams, groups, slop, a, b)


def test_mtp_matches_simple_when_no_groups():
    rng = random.Random(9)
    for _ in range(200):
        k = rng.randint(2, 4)
        streams = [
            sorted(rng.sample(range(-3, 25), rng.randint(1, 6)))
            for _ in range(k)
        ]
        slop = rng.randint(0, 4)
        assert lucene_sloppy_freq_mtp(
            [list(s) for s in streams], [-1] * k, slop
        ) == lucene_sloppy_freq([list(s) for s in streams], slop)


def test_mtp_slop_monotone():
    rng = random.Random(1234)
    for _ in range(150):
        # two 2-term slots sharing one term: always MTP
        a = sorted(rng.sample(range(0, 20), rng.randint(1, 5)))
        b = sorted(rng.sample(range(0, 20), rng.randint(1, 5)))
        c = sorted(rng.sample(range(0, 20), rng.randint(1, 5)))
        s0 = sorted(p - 0 for p in set(a) | set(b))
        s1 = sorted(p - 1 for p in set(b) | set(c))
        prev = -1.0
        for slop in range(0, 7):
            f = lucene_sloppy_freq_mtp([list(s0), list(s1)], [0, 0], slop)
            assert f >= prev - 1e-12
            prev = f


# --- end-to-end frames ---

@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=4, build_positions=True,
    )


def test_multiphrase_single_term_slots_match_phrase(index):
    """Single-term slots reduce to the ordinary sloppy phrase (same kernel
    family, same idf set)."""
    mq = MultiPhraseQuery((("table",), ("scan",)), slop=2)
    pq = PhraseQuery(("table", "scan"), slop=2)
    a = [(int(r.docid), float(r.score)) for r in
         multiphrase_topk(index, mq).orderBy("docid").collect()]
    b = [(int(r.docid), float(r.score)) for r in
         sloppy_phrase_lucene_topk(index, pq).orderBy("docid").collect()]
    assert a == b and a


def test_multiphrase_synonym_slot_superset(index):
    """A multi-term slot matches a superset of either single-term variant's
    docs (union postings)."""
    mq = MultiPhraseQuery((("table", "index"), ("scan",)), slop=1)
    got = {int(r.docid) for r in multiphrase_topk(index, mq).collect()}
    for t0 in ("table", "index"):
        sub = {
            int(r.docid)
            for r in sloppy_phrase_lucene_topk(
                index, PhraseQuery((t0, "scan"), slop=1)
            ).collect()
        }
        assert sub <= got


def test_multiphrase_mtp_end_to_end(spark):
    """Tiny corpus exercising the hidden-collision case through the full
    frame path: doc1 'alpha gamma beta' matches {alpha,beta} {beta,gamma}."""
    docs = spark.createDataFrame(
        [
            (1, "alpha gamma beta"),
            (2, "alpha beta"),
            (3, "gamma alpha"),
            (4, "beta beta"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, build_positions=True,
    )
    mq = MultiPhraseQuery((("alpha", "beta"), ("beta", "gamma")), slop=0)
    got = {int(r.docid) for r in multiphrase_topk(idx, mq).collect()}
    # doc1: alpha@0,gamma@1 exact; doc2: alpha@0,beta@1 exact;
    # doc4: beta@0,beta@1 — distinct tokens for the two slots, exact;
    # doc3: gamma@0,alpha@1 — wrong order, no exact match
    assert got == {1, 2, 4}
