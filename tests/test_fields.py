"""Multi-field schema: per-field postings/norms/stats, field: query syntax,
field-aware boolean search and DisMax over real fields."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.fields import (
    build_multifield_index,
    dismax_fields,
    search_fields,
    search_parsed_fields,
)
from lucene_solr_spark.search.parser import CompositeQuery, parse_query
from lucene_solr_spark.search.query import BooleanQuery, PhraseQuery, PrefixQuery, TermQuery


@pytest.fixture(scope="module")
def mfi(spark):
    rows = [
        (0, "alpha beta gamma", "alpha title"),
        (1, "beta gamma delta", "beta things"),
        (2, "gamma delta alpha", "unrelated heading"),
        (3, "delta alpha beta", "alpha beta title"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string, title string")
    return build_multifield_index(
        spark, docs, key_col="doc_id",
        field_exprs={"body": "body", "title": "title"},
        default_field="body", docid_col="doc_id",
        num_index_partitions=2, persist=False, build_positions=True,
    )


# -- parser field: productions ------------------------------------------------

def test_parse_field_term():
    q = parse_query("title:merge scan")
    assert q == BooleanQuery(
        should=(TermQuery("merge", field="title"), TermQuery("scan"))
    )


def test_parse_field_phrase_and_prefix():
    q = parse_query('title:"alpha beta" body:alp*')
    assert isinstance(q, CompositeQuery)
    assert q.should_specials == (
        PhraseQuery(("alpha", "beta"), field="title"),
        PrefixQuery("alp", field="body"),
    )


def test_parse_field_with_sign_and_boost():
    q = parse_query("+title:merge^2 -title:slow")
    assert q == BooleanQuery(
        must=(TermQuery("merge", boost=2.0, field="title"),),
        must_not=(TermQuery("slow", field="title"),),
    )


# -- per-field stats ----------------------------------------------------------

def test_per_field_stats_independent(mfi):
    body, title = mfi.of("body"), mfi.of("title")
    assert body.avgdl == 3.0
    assert title.avgdl == 2.25  # (2+2+2+3)/4
    body_df = {r.term: r.df for r in body.term_stats().collect()}
    title_df = {r.term: r.df for r in title.term_stats().collect()}
    assert body_df["alpha"] == 3
    assert title_df["alpha"] == 2
    assert title_df["title"] == 2
    assert "title" not in body_df


def test_unknown_field_raises(mfi):
    with pytest.raises(KeyError):
        mfi.of("nope")


# -- field-aware search -------------------------------------------------------

def test_search_fields_routes_terms(mfi):
    # title:title matches docs 0 and 3 only (term absent from all bodies)
    q = BooleanQuery(must=(TermQuery("title", field="title"),))
    got = {r.docid for r in search_fields(mfi, q, k=10).collect()}
    assert got == {0, 3}


def test_search_fields_must_across_fields(mfi):
    # body must contain delta AND title must contain alpha -> doc 3 only
    q = BooleanQuery(
        must=(TermQuery("delta"), TermQuery("alpha", field="title"))
    )
    got = {r.docid for r in search_fields(mfi, q, k=10).collect()}
    assert got == {3}


def test_search_fields_must_not_field_scoped(mfi):
    # beta in body, but NOT title:alpha -> docs 0,3 excluded by title
    q = BooleanQuery(
        must=(TermQuery("beta"),),
        must_not=(TermQuery("alpha", field="title"),),
    )
    got = {r.docid for r in search_fields(mfi, q, k=10).collect()}
    assert got == {1}


def test_parsed_fields_end_to_end(mfi):
    # MUST title:alpha -> {0,3}; optional delta only adds score
    got = {r.docid for r in search_parsed_fields(mfi, "delta +title:alpha").collect()}
    assert got == {0, 3}
    got_both = {
        r.docid for r in search_parsed_fields(mfi, "+delta +title:alpha").collect()
    }
    assert got_both == {3}
    got2 = {r.docid for r in search_parsed_fields(mfi, 'title:"alpha beta"').collect()}
    assert got2 == {3}
    # same-scored docs as direct execution
    a = [(r.docid, r.score) for r in search_parsed_fields(mfi, "title:alpha beta").collect()]
    q = BooleanQuery(should=(TermQuery("alpha", field="title"), TermQuery("beta")))
    b = [(r.docid, r.score) for r in search_fields(mfi, q, k=10).collect()]
    assert a == b


def test_dismax_fields_prefers_title_boost(mfi):
    # 'alpha' in title (boost 3) should dominate body-only matches
    got = [
        (r.docid, r.score)
        for r in dismax_fields(
            mfi, ["alpha"], qf={"title": 3.0, "body": 1.0}, tie=0.0, k=10
        ).collect()
    ]
    docs = [d for d, _ in got]
    assert set(docs) == {0, 2, 3}
    # title matches (0, 3) outrank the body-only match (2)
    assert set(docs[:2]) == {0, 3}
    assert docs[2] == 2


def test_dismax_fields_tie_adds_other_fields(mfi):
    no_tie = {
        r.docid: r.score
        for r in dismax_fields(mfi, ["alpha"], {"title": 3.0, "body": 1.0}, tie=0.0).collect()
    }
    with_tie = {
        r.docid: r.score
        for r in dismax_fields(mfi, ["alpha"], {"title": 3.0, "body": 1.0}, tie=0.5).collect()
    }
    # doc 3 matches alpha in BOTH fields: tie adds the non-max contribution
    assert with_tie[3] > no_tie[3]
    # doc 2 matches body only: tie changes nothing
    assert with_tie[2] == no_tie[2]


def test_parse_qf_and_string_form(mfi):
    from lucene_solr_spark.index.fields import parse_qf

    assert parse_qf("title^2 body") == {"title": 2.0, "body": 1.0}
    assert parse_qf("a^0.5 b c^3") == {"a": 0.5, "b": 1.0, "c": 3.0}
    a = dismax_fields(mfi, ["alpha"], qf=parse_qf("title^3 body"), tie=0.5)
    b = dismax_fields(mfi, ["alpha"], qf={"title": 3.0, "body": 1.0}, tie=0.5)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


# -- edismax ------------------------------------------------------------------

def test_calculate_min_should_match_specs():
    from lucene_solr_spark.index.fields import calculate_min_should_match as c

    assert c(5, "3") == 3
    assert c(5, "-2") == 3
    assert c(5, "100%") == 5
    assert c(4, "75%") == 3
    assert c(5, "-25%") == 4  # all but int(5*0.25)=1
    assert c(5, "0%") == 0
    assert c(2, "3") == 2     # clamp to optional count
    # conditional: <=2 -> all; 3..4 -> -1; >4 -> 75%
    assert c(2, "2<-1 4<75%") == 2
    assert c(4, "2<-1 4<75%") == 3
    assert c(8, "2<-1 4<75%") == 6


def test_edismax_mm_and_phrase_boost(spark, mfi):
    from lucene_solr_spark.index.fields import edismax_fields

    # mm=100%: both terms must match (in any field)
    got = edismax_fields(
        mfi, ["alpha", "beta"], qf={"title": 2.0, "body": 1.0},
        tie=0.1, mm="100%",
    )
    docids = {r.docid for r in got.collect()}
    # alpha AND beta both present (any field): doc 0 (body), doc 3 (body +
    # title); doc 1 lacks alpha, doc 2 lacks beta -> excluded
    assert docids == {0, 3}
    # mm=50% of 2 terms -> 1: any single term matches
    loose = {r.docid for r in edismax_fields(
        mfi, ["alpha", "beta"], qf={"title": 2.0, "body": 1.0},
        mm="50%").collect()}
    assert loose == {0, 1, 2, 3}

    # pf phrase boost: "alpha beta" adjacent in body only in docs 0 and 3
    plain = {r.docid: r.score for r in edismax_fields(
        mfi, ["alpha", "beta"], qf={"body": 1.0}, mm="50%").collect()}
    boosted = {r.docid: r.score for r in edismax_fields(
        mfi, ["alpha", "beta"], qf={"body": 1.0}, mm="50%",
        pf={"body": 2.0}).collect()}
    assert set(plain) == set(boosted)  # pf never admits new docs
    assert boosted[0] > plain[0] and boosted[3] > plain[3]
    assert boosted[2] == plain[2]  # no adjacent phrase in doc 2


def test_repeated_term_scores_once(mfi):
    # 'alpha alpha' must rank identically to 'alpha' (bm25._boolean_topk
    # dedups terms; the multi-field path must not double-add)
    one = [(r.docid, r.score) for r in search_parsed_fields(mfi, "alpha").collect()]
    two = [(r.docid, r.score) for r in search_parsed_fields(mfi, "alpha alpha").collect()]
    assert one == two and len(one) > 0


def test_repeated_term_must_wins_over_should(mfi):
    q = BooleanQuery(
        must=(TermQuery("alpha"),),
        should=(TermQuery("alpha"), TermQuery("beta")),
    )
    got = [(r.docid, r.score) for r in search_fields(mfi, q, k=10).collect()]
    want = [
        (r.docid, r.score)
        for r in search_fields(
            mfi, BooleanQuery(must=(TermQuery("alpha"),), should=(TermQuery("beta"),)), k=10
        ).collect()
    ]
    assert got == want


def test_edismax_bq_bf_additive(spark, mfi):
    """bq/bf are additive SHOULD clauses (DisMaxQParser.java:113-150): they
    re-rank docs the main query matched, never admit new ones."""
    import math

    from lucene_solr_spark.index.fields import edismax_fields

    base = {r.docid: r.score for r in edismax_fields(
        mfi, ["alpha", "beta"], qf={"body": 1.0}, mm="50%").collect()}

    # bq: docs with 'title' in the title field (0, 1, 3) gain; same doc set
    bq = {r.docid: r.score for r in edismax_fields(
        mfi, ["alpha", "beta"], qf={"body": 1.0}, mm="50%",
        bq=[("title", "title", 2.0)]).collect()}
    assert set(bq) == set(base)
    assert bq[0] > base[0] and bq[3] > base[3]
    assert bq[2] == base[2]  # doc 2's title has no 'title' term

    # bf: ln(num_terms) adds the same amount to every 3-term doc
    bf = {r.docid: r.score for r in edismax_fields(
        mfi, ["alpha", "beta"], qf={"body": 1.0}, mm="50%",
        bf=["ln(num_terms)"]).collect()}
    assert set(bf) == set(base)
    for d in bf:
        assert bf[d] == pytest.approx(base[d] + math.log(3.0), abs=2e-4)


def test_copyfield_catchall(spark):
    """copyField (IndexSchema.java:139,738,810-811 registerCopyField): a
    catchall destination field indexes the concatenation of its sources —
    expressed as a computed field_exprs entry, the schema mechanism the
    builder already has."""
    rows = [
        (0, "alpha beta", "gamma title"),
        (1, "delta only", "epsilon heading"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, body string, title string")
    mfi = build_multifield_index(
        spark, docs, key_col="doc_id",
        field_exprs={
            "body": "body",
            "title": "title",
            "catchall": F.concat_ws(" ", F.col("title"), F.col("body")),
        },
        default_field="catchall", docid_col="doc_id",
        num_index_partitions=2, persist=False,
    )
    from lucene_solr_spark.search import search

    # terms from EITHER source match in the catchall field
    assert {r.docid for r in search(mfi.of("catchall"), "gamma", k=5).collect()} == {0}
    assert {r.docid for r in search(mfi.of("catchall"), "delta", k=5).collect()} == {1}
    # source fields stay separately searchable with their own stats
    assert {r.docid for r in search(mfi.of("body"), "gamma", k=5).collect()} == set()
    # catchall doc length = title + body tokens (copy happens pre-analysis)
    dl = {r.docid: r.num_terms for r in mfi.of("catchall").docs.collect()}
    assert dl == {0: 4, 1: 4}
