"""End-to-end: build index on real testdata, differential-test BM25 vs the
pure-Python oracle across the query zoo, check index invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index, verify_index
from lucene_solr_spark.search import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    WildcardQuery,
    search,
)
from tests.oracle_py import make_oracle


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, passthrough_cols=("lang", "source", "n_chars"),
        build_positions=True,
    )


@pytest.fixture(scope="module")
def oracle(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return make_oracle([(int(r.doc_id), r.text) for r in rows])


def _compare(got_df, want, k):
    got = [(int(r.docid), float(r.score)) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in want[:k]], (got, want[:k])
    for (gd, gs), (wd, ws) in zip(got, want[:k]):
        assert abs(gs - round(ws, 4)) < 2e-4, (gd, gs, ws)


def test_invariants(index):
    v = verify_index(index)
    assert all(x == 0 for x in v.values()), v


def test_stats_match_oracle(index, oracle):
    assert index.max_doc == oracle.max_doc
    assert index.sum_total_term_freq == sum(sum(c.values()) for c in oracle.tf.values())
    assert index.avgdl == oracle.avgdl
    df_eng = {r.term: r.df for r in index.term_stats().collect()}
    assert df_eng == dict(oracle.df)


@pytest.mark.parametrize("term", ["table", "spark", "customer", "vector"])
def test_single_term(index, oracle, term):
    _compare(search(index, term, k=10), oracle.topk(must=[term], k=10), 10)


def test_conjunction(index, oracle):
    q = BooleanQuery.of(must=["table", "merge"])
    _compare(search(index, q, k=10), oracle.topk(must=["table", "merge"], k=10), 10)


def test_disjunction(index, oracle):
    q = BooleanQuery.of(should=["vector", "stream", "hash"])
    want = oracle.topk(should=["vector", "stream", "hash"], k=10)
    _compare(search(index, q, k=10), want, 10)


def test_min_should_match(index, oracle):
    q = BooleanQuery.of(should=["vector", "stream", "hash"], mm=2)
    want = oracle.topk(should=["vector", "stream", "hash"], mm=2, k=10)
    _compare(search(index, q, k=10), want, 10)


def test_must_not(index, oracle):
    q = BooleanQuery.of(must=["table"], must_not=["merge"])
    want = oracle.topk(must=["table"], must_not=["merge"], k=10)
    _compare(search(index, q, k=10), want, 10)


def test_stopword_term_ignored(index, oracle):
    # 'the' never got indexed: a query for it matches nothing
    assert search(index, "the", k=10).count() == 0


def test_match_all(index):
    got = search(index, MatchAllQuery(), k=10_000).count()
    assert got == index.max_doc


def test_phrase(index, oracle):
    q = PhraseQuery(terms=("table", "scan"))
    want = oracle.phrase_topk(["table", "scan"], k=10)
    got = search(index, q, k=10)
    _compare(got, want, 10)


def test_prefix_and_wildcard(index, oracle):
    got = search(index, PrefixQuery("sc"), k=10, rewrite="scoring_boolean")
    # expansion: all indexed terms starting 'sc' -> OR
    terms = sorted(t for t in oracle.df if t.startswith("sc"))
    want = oracle.topk(should=terms, mm=1, k=10)
    _compare(got, want, 10)
    got_w = search(index, WildcardQuery("s??n"), k=10, rewrite="scoring_boolean")
    terms_w = sorted(t for t in oracle.df if len(t) == 4 and t[0] == "s" and t[3] == "n")
    want_w = oracle.topk(should=terms_w, mm=1, k=10)
    _compare(got_w, want_w, 10)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy(index, oracle):
    got = search(index, FuzzyQuery("tble", max_edits=1), k=10, rewrite="scoring_boolean")
    terms = sorted(t for t in oracle.df if _lev("tble", t) <= 1)
    want = oracle.topk(should=terms, mm=1, k=10)
    _compare(got, want, 10)


def test_term_range(index, oracle):
    got = search(index, RangeQuery("sa", "sd"), k=10, rewrite="scoring_boolean")
    terms = sorted(t for t in oracle.df if "sa" <= t <= "sd")
    want = oracle.topk(should=terms, mm=1, k=10)
    _compare(got, want, 10)


def test_search_after_pagination(index, oracle):
    want = oracle.topk(must=["table"], k=20)
    page1 = [(int(r.docid), float(r.score)) for r in search(index, "table", k=10).collect()]
    cursor = (page1[-1][1], page1[-1][0])
    page2 = search(index, "table", k=10, after=cursor)
    _compare(page2, [(d, s) for d, s in want[10:]], 10)


def test_parallelism_invariance(spark, sf_dir, index):
    """Control-vs-sharded analog (BaseDistributedSearchTestCase): a rebuild at
    different partitioning must give identical results."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx2 = build_index(
        spark, docs.repartition(3), key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False,
    )
    a = [(r.docid, r.score) for r in search(index, "table", k=10).collect()]
    b = [(r.docid, r.score) for r in search(idx2, "table", k=10).collect()]
    assert a == b


def test_constant_score_rewrite_default(index, oracle):
    # Lucene CONSTANT_SCORE_AUTO_REWRITE: matching docs all score 1.0, docid order
    got = [(int(r.docid), float(r.score)) for r in search(index, PrefixQuery("sc"), k=10).collect()]
    terms = sorted(t for t in oracle.df if t.startswith("sc"))
    want_docs = sorted({d for d in oracle.docids if any(oracle.tf[d].get(t) for t in terms)})[:10]
    assert got == [(d, 1.0) for d in want_docs]


# ---------------------------------------------------------------------------
# sloppy phrase (slop > 0) — SloppyPhraseScorer semantics, anchor-based
# ---------------------------------------------------------------------------

def _tiny_index(spark, texts):
    from lucene_solr_spark.index.builder import build_index

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, build_positions=True, persist=False,
    )


def test_sloppy_phrase_match_set_and_weights(spark):
    """matchLength per anchor: 0=adjacent, 1=one gap, 2=reversed/two gaps;
    sloppyFreq = 1/(1+matchLength)."""
    import math

    from lucene_solr_spark.search import PhraseQuery, search
    from lucene_solr_spark.smallfloat import NORM_TABLE, encode_norm

    texts = [
        "alpha beta",                 # exact: ml=0, tf=1
        "alpha gamma beta",           # one gap: ml=1, tf=1/2
        "beta alpha",                 # reversed: ml=2, tf=1/3
        "alpha delta delta beta",     # two gaps: ml=2, tf=1/3
        "beta gamma gamma alpha",     # ml=4 > slop: no match
        "gamma delta",                # neither term
    ]
    idx = _tiny_index(spark, texts)
    got = {
        r.docid: r.score
        for r in search(idx, PhraseQuery(("alpha", "beta"), slop=2), k=10).collect()
    }
    assert set(got) == {0, 1, 2, 3}

    # exact expected scores (engine formula, float64)
    dfs = {"alpha": 5, "beta": 5}  # both terms appear in docs 0-4
    n = 6
    idf_sum = sum(
        math.log(1.0 + (n - df + 0.5) / (df + 0.5)) for df in dfs.values()
    )
    lens = [2, 3, 2, 4, 4, 2]
    avgdl = idx.avgdl
    import numpy as np

    def expect(doc, tf):
        dl = float(NORM_TABLE[int(encode_norm(lens[doc])[0])])
        s = idf_sum * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return float(np.round(s, 4))

    tf0 = 0.0 + 1 * 1.0
    tf1 = 0.0 + 0 * 1.0 + 1 * 0.5
    tf2 = 0.0 + 0 * 1.0 + 0 * 0.5 + 1 * (1.0 / 3)
    assert got[0] == pytest.approx(expect(0, tf0), abs=1e-9)
    assert got[1] == pytest.approx(expect(1, tf1), abs=1e-9)
    assert got[2] == pytest.approx(expect(2, tf2), abs=1e-9)
    assert got[3] == pytest.approx(expect(3, tf2), abs=1e-9)


def test_sloppy_slop0_equals_exact_path(spark):
    from lucene_solr_spark.search import PhraseQuery, search
    from lucene_solr_spark.search.bm25 import _sloppy_phrase_topk

    texts = ["alpha beta gamma", "beta alpha", "alpha beta alpha beta"]
    idx = _tiny_index(spark, texts)
    exact = {
        (r.docid, r.score)
        for r in search(idx, PhraseQuery(("alpha", "beta")), k=10).collect()
    }
    # slop=0 through the sloppy kernel: ml=0 only, tf = exact alignment count
    sloppy = {
        (r.docid, r.score)
        for r in _sloppy_phrase_topk(
            idx, PhraseQuery(("alpha", "beta"), slop=0), round_dp=4
        ).collect()
    }
    assert sloppy == exact


def test_parsed_sloppy_phrase_dispatch(spark):
    from lucene_solr_spark.search import PhraseQuery, search
    from lucene_solr_spark.search.bm25 import search_parsed

    texts = ["alpha beta", "alpha gamma beta", "beta alpha", "gamma delta"]
    idx = _tiny_index(spark, texts)
    got = [(r.docid, r.score) for r in search_parsed(idx, '"alpha beta"~2').collect()]
    want = [
        (r.docid, r.score)
        for r in search(idx, PhraseQuery(("alpha", "beta"), slop=2), k=10).collect()
    ]
    assert got == want and len(got) == 3


def test_multiterm_constant_score_plan_has_no_driver_expansion(spark):
    """Constant-score rewrite must be a semi-join against the dictionary —
    no collect() of expanded terms, no BatchEvalPython."""
    from lucene_solr_spark.search import PrefixQuery, search

    texts = ["alpha beta", "alps beta", "gamma delta", "alpine gamma"]
    idx = _tiny_index(spark, texts)
    df = search(idx, PrefixQuery("alp"), k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    got = {r.docid for r in df.collect()}
    assert got == {0, 1, 3}


def test_scoring_rewrite_max_clause_count(spark):
    from lucene_solr_spark.search import PrefixQuery
    from lucene_solr_spark.search.bm25 import TooManyClauses, _expand_terms

    texts = ["alpha alps alpine", "beta gamma"]
    idx = _tiny_index(spark, texts)
    assert _expand_terms(idx, PrefixQuery("alp")) == ["alpha", "alpine", "alps"]
    with pytest.raises(TooManyClauses):
        _expand_terms(idx, PrefixQuery("alp"), max_clauses=2)


# ---------------------------------------------------------------------------
# span-near (ordered/unordered) + block join
# ---------------------------------------------------------------------------

def test_span_near_ordered_vs_unordered(spark):
    from lucene_solr_spark.search.bm25 import span_near_topk

    texts = [
        "alpha beta",            # ordered adjacent: ml=0
        "alpha gamma beta",      # ordered 1 gap: ml=1
        "beta alpha",            # reversed: ordered NO; unordered window ml=0
        "alpha gamma gamma beta" # ordered ml=2 > slop 1; unordered ml=2
    ]
    idx = _tiny_index(spark, texts)
    ordered = {r.docid for r in span_near_topk(idx, ["alpha", "beta"], slop=1).collect()}
    assert ordered == {0, 1}
    unordered = {
        r.docid
        for r in span_near_topk(
            idx, ["alpha", "beta"], slop=2, in_order=False
        ).collect()
    }
    assert unordered == {0, 1, 2, 3}


def test_span_near_three_terms_greedy_chain(spark):
    from lucene_solr_spark.search.bm25 import span_near_topk

    texts = [
        "alpha beta gamma",        # chain slack 0
        "alpha x beta y gamma",    # slack 2
        "gamma beta alpha",        # wrong order
    ]
    idx = _tiny_index(spark, texts)
    got0 = {r.docid for r in span_near_topk(idx, ["alpha", "beta", "gamma"], slop=0).collect()}
    assert got0 == {0}
    got2 = {r.docid for r in span_near_topk(idx, ["alpha", "beta", "gamma"], slop=2).collect()}
    assert got2 == {0, 1}


def test_span_near_with_or_clause(spark):
    """SpanNearQuery with a nested SpanOrQuery clause: either alternative
    satisfies the clause position."""
    from lucene_solr_spark.search.bm25 import span_near_topk

    texts = [
        "fast scan now",      # fast->scan adjacent
        "quick scan here",    # quick->scan adjacent
        "slow scan there",    # neither alternative
        "fast jump scan",     # one gap
    ]
    idx = _tiny_index(spark, texts)
    got0 = {
        r.docid
        for r in span_near_topk(idx, [["fast", "quick"], "scan"], slop=0).collect()
    }
    assert got0 == {0, 1}
    got1 = {
        r.docid
        for r in span_near_topk(idx, [["fast", "quick"], "scan"], slop=1).collect()
    }
    assert got1 == {0, 1, 3}


def test_span_or_total_occurrences(spark):
    """SpanOrQuery: tf = total occurrences of ANY clause term, one idf sum
    over clauses — distinct from boolean OR's per-term score sum."""
    import math

    from lucene_solr_spark.search.bm25 import span_or_topk

    texts = [
        "alpha alpha beta",  # tf = 3
        "alpha",             # tf = 1
        "gamma",             # no match
        "beta beta",         # tf = 2
    ]
    idx = _tiny_index(spark, texts)
    rows = {r.docid: r.score for r in span_or_topk(idx, ["alpha", "beta"]).collect()}
    assert set(rows) == {0, 1, 3}
    dl = {r.docid: r.dl_approx for r in idx.docs.collect()}
    dfs = {r.term: r.df for r in idx.term_stats().collect()}
    idf = sum(
        math.log(1 + (4 - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in ["alpha", "beta"]
    )
    for d, tf in {0: 3, 1: 1, 3: 2}.items():
        exp = idf * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl[d] / idx.avgdl))
        assert rows[d] == pytest.approx(exp, abs=1e-3)


def test_span_not_excludes_overlapping_spans(spark):
    """SpanNotQuery: include spans overlapping the exclude term (window
    widened by pre/post) are dropped; non-overlapping spans still score."""
    from lucene_solr_spark.search.bm25 import span_not_topk

    texts = [
        "alpha beta",        # clean span
        "alpha beta bad",    # excluded only when post >= 1
        "bad alpha beta",    # excluded only when pre >= 1
        "alpha beta x bad",  # bad beyond post=1 window: kept
        "alpha bad beta",    # bad INSIDE the slop-1 span: always excluded
    ]
    idx = _tiny_index(spark, texts)
    got = {
        r.docid
        for r in span_not_topk(
            idx, ["alpha", "beta"], "bad", slop=1, pre=1, post=1
        ).collect()
    }
    assert got == {0, 3}
    got0 = {
        r.docid
        for r in span_not_topk(idx, ["alpha", "beta"], "bad", slop=1).collect()
    }
    assert got0 == {0, 1, 2, 3}
    # single include term: SpanTermQuery spans [p, p]
    got1 = {r.docid for r in span_not_topk(idx, ["alpha"], "bad", post=1).collect()}
    assert got1 == {0, 1, 2, 3}


def test_block_join_score_modes(spark):
    from lucene_solr_spark.search.bm25 import to_child_block_join, to_parent_block_join

    rows = [(1, 10.0), (1, 4.0), (2, 6.0), (3, 2.0)]
    children = spark.createDataFrame(rows, "parent long, score double")
    mx = {r.parent: r.score for r in to_parent_block_join(children, "parent", "max").collect()}
    assert mx == {1: 10.0, 2: 6.0, 3: 2.0}
    tot = {r.parent: r.score for r in to_parent_block_join(children, "parent", "total").collect()}
    assert tot == {1: 14.0, 2: 6.0, 3: 2.0}
    parents = spark.createDataFrame([(1,), (3,)], "parent long")
    kids = to_child_block_join(parents, children, "parent")
    assert {(r.parent, r.score) for r in kids.collect()} == {(1, 10.0), (1, 4.0), (3, 2.0)}


def test_early_terminating_topk_on_index_sorted_docs(spark, index):
    """Early termination over an index-time sort: equal to the full global
    sort while reading only k rows per partition."""
    from lucene_solr_spark.search.bm25 import early_terminating_topk

    order = [F.col("n_chars").desc(), F.col("docid").asc()]
    docs = idx_docs = index.docs.select("docid", "n_chars")
    sorted_store = docs.repartition(4).sortWithinPartitions(*order)
    got = [
        (r.docid, r.n_chars)
        for r in early_terminating_topk(sorted_store, order, k=10).collect()
    ]
    want = [(r.docid, r.n_chars) for r in docs.orderBy(*order).limit(10).collect()]
    assert got == want


@pytest.mark.parametrize("terms,slop", [
    (("table", "scan"), 1),
    (("table", "scan"), 3),
    (("data", "stream"), 2),
])
def test_sloppy_phrase_matches_bruteforce_oracle(index, oracle, terms, slop):
    from lucene_solr_spark.search.bm25 import _sloppy_phrase_topk
    from tests.oracle_py import sloppy_phrase_topk

    got = (
        _sloppy_phrase_topk(index, PhraseQuery(tuple(terms), slop=slop), 4)
        .orderBy(F.col("score").desc(), F.col("docid").asc()).limit(10)
    )
    want = sloppy_phrase_topk(oracle, list(terms), slop, k=10)
    _compare(got, want, 10)


# ---------------------------------------------------------------------------
# exact (greedy) sloppy phrase — SloppyPhraseScorer.phraseFreq parity
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _position_streams(draw):
    k = draw(st.integers(min_value=2, max_value=4))
    streams = []
    for _ in range(k):
        n = draw(st.integers(min_value=1, max_value=8))
        gaps = draw(st.lists(st.integers(min_value=0, max_value=6),
                             min_size=n, max_size=n))
        pos, acc = [], draw(st.integers(min_value=-3, max_value=10))
        for g in gaps:
            acc += g
            if not pos or acc > pos[-1]:
                pos.append(acc)
            acc += 1
        streams.append(pos)
    return streams


@given(_position_streams(), st.integers(min_value=0, max_value=4))
@settings(max_examples=300, deadline=None)
def test_lucene_sloppy_freq_matches_independent_reference(streams, slop):
    from lucene_solr_spark.search.bm25 import lucene_sloppy_freq
    from tests.oracle_py import lucene_sloppy_freq_reference

    assert lucene_sloppy_freq(streams, slop) == pytest.approx(
        lucene_sloppy_freq_reference(streams, slop)
    )


@pytest.mark.parametrize("terms,slop", [
    (("table", "scan"), 1),
    (("table", "scan"), 3),
    (("data", "stream", "window"), 2),
])
def test_sloppy_lucene_topk_matches_corpus_oracle(index, oracle, terms, slop):
    from lucene_solr_spark.search.bm25 import sloppy_phrase_lucene_topk
    from tests.oracle_py import lucene_sloppy_topk

    got = (
        sloppy_phrase_lucene_topk(index, PhraseQuery(tuple(terms), slop=slop))
        .orderBy(F.col("score").desc(), F.col("docid").asc()).limit(10)
    )
    want = lucene_sloppy_topk(oracle, list(terms), slop, k=10)
    _compare(got, want, 10)


def test_sloppy_lucene_handles_repeats(index):
    """Repeated-term phrases run the hasRpts kernel (formerly a ValueError);
    results are non-empty on this corpus and every hit carries the term at
    least twice."""
    from lucene_solr_spark.search.bm25 import sloppy_phrase_lucene_topk

    out = sloppy_phrase_lucene_topk(index, PhraseQuery(("table", "table"), slop=6))
    rows = out.collect()
    assert rows
    multi = {
        r.docid
        for r in index.postings.filter(
            (F.col("term") == "table") & (F.col("tf") >= 2)
        ).collect()
    }
    assert {r.docid for r in rows} <= multi


def test_mlt_term_selection_gates(index):
    """mlt.mintf/mindf/maxdf gates (MoreLikeThis.java:161-178) narrow the
    interesting-term set; no-gate defaults reproduce the ungated behavior."""
    from lucene_solr_spark.search.bm25 import more_like_this

    base = [(r.docid, r.score) for r in more_like_this(index, 0, max_query_terms=5).collect()]
    assert base
    # max_doc_freq=1 keeps only hapax dictionary terms of doc 0 (likely none)
    rare_only = more_like_this(index, 0, max_query_terms=5, max_doc_freq=1)
    stats = {
        r.term: (r.tf, r.df)
        for r in index.postings.filter(F.col("docid") == 0)
        .join(index.term_stats(), "term")
        .select("term", "tf", "df")
        .collect()
    }
    n_rare = sum(1 for tf, df in stats.values() if df <= 1)
    if n_rare == 0:
        assert rare_only.count() == 0
    # a mindf above every df of doc 0's terms selects nothing
    too_high = max(df for _, df in stats.values()) + 1
    assert more_like_this(index, 0, min_doc_freq=too_high).count() == 0
    # gates at their floor values change nothing
    ungated = [
        (r.docid, r.score)
        for r in more_like_this(
            index, 0, max_query_terms=5, min_term_freq=1, min_doc_freq=1
        ).collect()
    ]
    assert ungated == base


def test_sloppy_rpts_kernel_no_repeat_differential():
    """With no repeat groups the rpts kernel must equal the initSimple loop
    bit-for-bit (shared main-loop semantics)."""
    import random

    from lucene_solr_spark.search.bm25 import (
        lucene_sloppy_freq,
        lucene_sloppy_freq_rpts,
    )

    rng = random.Random(7)
    for _ in range(800):
        k = rng.randint(2, 4)
        streams = [
            sorted(rng.sample(range(-3, 25), rng.randint(1, 7))) for _ in range(k)
        ]
        slop = rng.randint(0, 5)
        assert lucene_sloppy_freq(
            [list(s) for s in streams], slop
        ) == lucene_sloppy_freq_rpts([list(s) for s in streams], [-1] * k, slop)


def test_sloppy_rpts_kernel_goldens():
    """Hand-executed SloppyPhraseScorer cases with repeated terms."""
    from lucene_solr_spark.search.bm25 import lucene_sloppy_freq_rpts

    # doc "a b a", phrase "a b a"~0: one exact match
    assert lucene_sloppy_freq_rpts([[0, 2], [0], [-2, 0]], [0, -1, 0], 0) == 1.0
    # phrase "a a" on a doc with ONE 'a': repeat-group init exhausts -> 0
    assert lucene_sloppy_freq_rpts([[0], [-1]], [0, 0], 10) == 0.0
    # doc "a x a", phrase "a a"~1: one match at matchLength 1 -> 0.5
    assert lucene_sloppy_freq_rpts([[0, 2], [-1, 1]], [0, 0], 1) == 0.5
    # slop monotonicity with a repeat group
    prev = -1.0
    for slop in range(0, 8):
        f = lucene_sloppy_freq_rpts([[0, 2, 5], [0], [-2, 0, 3]], [0, -1, 0], slop)
        assert f >= prev - 1e-12
        prev = f


def test_sloppy_phrase_repeats_end_to_end(spark, index):
    """search() with a repeated-term sloppy phrase runs the repeats kernel:
    distinct occurrences are required (a doc with a single 'table' never
    matches "table ... table")."""
    from pyspark.sql import functions as F
    from lucene_solr_spark.search import PhraseQuery, search

    q = PhraseQuery(("table", "table"), slop=6)
    got = {r.docid: r.score for r in search(index, q, k=50).collect()}
    # every hit has >= 2 'table' occurrences
    multi = {
        r.docid
        for r in index.postings.filter(
            (F.col("term") == "table") & (F.col("tf") >= 2)
        ).collect()
    }
    assert set(got) <= multi
    assert got  # the corpus has docs with repeated 'table'


def test_sloppy_rpts_kernel_randomized_invariants():
    """Randomized repeats cases: sloppyFreq is monotone non-decreasing in
    slop, zero when any repeat group outnumbers its stream, and finite."""
    import random

    from lucene_solr_spark.search.bm25 import lucene_sloppy_freq_rpts

    rng = random.Random(1807)
    for _ in range(200):
        # phrase of 3-4 slots over 2 distinct terms -> at least one repeat
        k = rng.randint(3, 4)
        n_terms = 2
        slot_term = [rng.randrange(n_terms) for _ in range(k)]
        while len(set(slot_term)) < 2 or max(
            slot_term.count(t) for t in set(slot_term)
        ) < 2:
            slot_term = [rng.randrange(n_terms) for _ in range(k)]
        term_pos = {
            t: sorted(rng.sample(range(0, 30), rng.randint(1, 8)))
            for t in set(slot_term)
        }
        streams = [[p - i for p in term_pos[slot_term[i]]] for i in range(k)]
        counts = {t: slot_term.count(t) for t in set(slot_term)}
        groups = [
            slot_term[i] if counts[slot_term[i]] > 1 else -1 for i in range(k)
        ]
        prev = -1.0
        for slop in range(0, 7):
            f = lucene_sloppy_freq_rpts(
                [list(s) for s in streams], list(groups), slop
            )
            if any(len(term_pos[t]) < c for t, c in counts.items()):
                assert f == 0.0  # repeat group cannot place distinct tokens
            assert f >= prev - 1e-12
            prev = f
