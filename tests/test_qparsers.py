"""QParser plugin registry: local-params parsing + each plugin vs the
engine-native equivalent it must reduce to (QParserPlugin.standardPlugins,
QParser.java:276-308 dispatch)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.qparsers import parse_local_params, qparser_search


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    from lucene_solr_spark.driver_queries import get_index

    return get_index(spark, sf_dir)


def _pairs(df):
    return [(r.docid, r.score) for r in df.collect()]


def test_parse_local_params_forms():
    assert parse_local_params("plain text") == ("lucene", {}, "plain text")
    t, p, b = parse_local_params("{!term f=lang}en")
    assert (t, p, b) == ("term", {"f": "lang"}, "en")
    t, p, b = parse_local_params("{!frange l=2 u=5 incu=false}div(n_chars,100)")
    assert t == "frange" and p == {"l": "2", "u": "5", "incu": "false"}
    t, p, b = parse_local_params("{!terms f=lang separator=';'}en;de")
    assert p["separator"] == ";" and b == "en;de"
    # v= local param overrides the body; bare leading token is the type
    t, p, b = parse_local_params('{!type=term f=lang v="en"}ignored')
    assert (t, b) == ("term", "en")


def test_term_qparser_docvalues_equality(index):
    out = qparser_search(index, "{!term f=lang}en", k=10)
    expect = (
        index.docs.filter(F.col("lang") == "en")
        .select("docid", F.lit(1.0).alias("score"))
        .orderBy("docid")
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_term_qparser_indexed_term_is_raw(index):
    # raw term match — no analysis: an upper-case body matches nothing
    # (the index stores lower-cased terms), the lower-cased body matches
    assert qparser_search(index, "{!term}Table", k=5).count() == 0
    out = qparser_search(index, "{!term}table", k=5)
    docids = {r.docid for r in out.collect()}
    expect = {
        r.docid
        for r in index.postings.filter(F.col("term") == "table")
        .select("docid")
        .orderBy("docid")
        .limit(5)
        .collect()
    }
    assert docids == expect


def test_terms_qparser_in_set(index):
    out = qparser_search(index, "{!terms f=lang}en,de", k=1000)
    expect = index.docs.filter(F.col("lang").isin(["en", "de"])).count()
    assert out.count() == min(expect, 1000)


def test_prefix_qparser_matches_constant_score_rewrite(index):
    from lucene_solr_spark.search import PrefixQuery, search

    out = qparser_search(index, "{!prefix}tab", k=10)
    expect = search(index, PrefixQuery("tab"), k=10)
    assert _pairs(out) == _pairs(expect)


def test_field_qparser_is_exact_phrase(index):
    from lucene_solr_spark.search import PhraseQuery, search

    out = qparser_search(index, "{!field}table scan", k=10)
    expect = search(index, PhraseQuery(("table", "scan")), k=10)
    assert _pairs(out) == _pairs(expect)


def test_frange_bounds_and_flags(index):
    incl = qparser_search(index, "{!frange l=2 u=5}div(n_chars,100)", k=10000)
    excl = qparser_search(
        index, "{!frange l=2 u=5 incl=false incu=false}div(n_chars,100)", k=10000
    )
    col = F.col("n_chars") / F.lit(100)
    n_incl = index.docs.filter((col >= 2) & (col <= 5)).count()
    n_excl = index.docs.filter((col > 2) & (col < 5)).count()
    assert incl.count() == n_incl
    assert excl.count() == n_excl
    assert n_excl <= n_incl


def test_complexphrase_no_wildcard_equals_exact_phrase(index):
    from lucene_solr_spark.search import PhraseQuery, search

    out = qparser_search(index, '{!complexphrase}"table scan"', k=10)
    expect = search(index, PhraseQuery(("table", "scan")), k=10)
    assert _pairs(out) == _pairs(expect)


def test_complexphrase_wildcard_equals_span_expansion(index):
    from lucene_solr_spark.search import PrefixQuery
    from lucene_solr_spark.search.bm25 import _expand_terms, span_near_topk

    out = qparser_search(index, '{!complexphrase}"tab* scan"~1', k=10)
    alts = _expand_terms(index, PrefixQuery("tab"))
    expect = (
        span_near_topk(index, [alts, "scan"], slop=1, in_order=True)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_maxscore_is_max_over_should(index):
    from lucene_solr_spark.search.bm25 import term_scores

    out = qparser_search(index, "{!maxscore}vector stream", k=10)
    s = term_scores(index, ["vector", "stream"])
    expect = (
        s.groupBy("docid")
        .agg(F.round(F.max("score"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_maxscore_must_stays_summed(index):
    # '+table vector' — MUST table scores as sum, SHOULD vector as max-of-one
    from lucene_solr_spark.search.bm25 import term_scores

    out = qparser_search(index, "{!maxscore}+table vector", k=10)
    st = term_scores(index, ["table", "vector"])
    per = st.groupBy("docid").agg(
        F.max(F.when(F.col("term") == "table", F.col("score"))).alias("a"),
        F.max(F.when(F.col("term") == "vector", F.col("score"))).alias("b"),
    )
    expect = (
        per.filter(F.col("a").isNotNull())
        .select(
            "docid",
            F.round(
                F.coalesce(F.col("a"), F.lit(0.0))
                + F.coalesce(F.col("b"), F.lit(0.0)),
                4,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_boost_qparser_reranks_by_function(index):
    from lucene_solr_spark.search import BooleanQuery
    from lucene_solr_spark.search.bm25 import _boolean_topk

    out = qparser_search(index, "{!boost b=log(n_chars)}table", k=10)
    # BoostedQuery multiplies RAW scores: high-precision intermediates
    # (round_dp=10), one rounding after the multiply
    base = _boolean_topk(index, BooleanQuery.of(should=["table"]), 10, 10)
    expect = (
        base.join(index.docs, "docid")
        .select(
            "docid",
            F.round(F.col("score") * F.log10(F.col("n_chars")), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_surround_w_is_ordered_span_near(index):
    from lucene_solr_spark.search.bm25 import span_near_topk

    out = qparser_search(index, "{!surround}2w(table, scan)", k=10)
    expect = (
        span_near_topk(index, ["table", "scan"], slop=1, in_order=True)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_surround_n_is_unordered_and_truncation_expands(index):
    from lucene_solr_spark.search import PrefixQuery
    from lucene_solr_spark.search.bm25 import _expand_terms, span_near_topk

    out = qparser_search(index, "{!surround}3n(merge, vec*)", k=10)
    alts = _expand_terms(index, PrefixQuery("vec"))
    expect = (
        span_near_topk(index, ["merge", alts], slop=2, in_order=False)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_join_qparser_matches_semi_join(index):
    out = qparser_search(index, "{!join from=source to=source}vector", k=20)
    m = (
        index.postings.filter(F.col("term") == "vector").select("docid").distinct()
    )
    srcs = index.docs.join(m, "docid").select("source").distinct()
    expect = (
        index.docs.join(F.broadcast(srcs), "source", "left_semi")
        .select("docid")
        .orderBy("docid")
        .limit(20)
    )
    assert [r.docid for r in out.collect()] == [r.docid for r in expect.collect()]


def test_join_qparser_boolean_body_and_bad_field(index):
    out = qparser_search(index, "{!join from=source to=source}+table -slow", k=5)
    assert out.count() > 0
    with pytest.raises(ValueError, match="join field"):
        qparser_search(index, "{!join from=nope to=source}vector")


def test_unknown_qparser_raises(index):
    with pytest.raises(ValueError, match="unknown qparser"):
        qparser_search(index, "{!nosuchparser}y")


# -- review-pass regressions ---------------------------------------------------

def test_undefined_field_raises(index):
    for q in ["{!term f=lagn}en", "{!terms f=nope}a,b", "{!prefix f=bogus}x"]:
        with pytest.raises(ValueError, match="undefined field"):
            qparser_search(index, q)
    with pytest.raises(ValueError, match="search_parsed_fields"):
        qparser_search(index, "{!field f=lang}en")


def test_maxscore_applies_clause_boosts(index):
    from lucene_solr_spark.search.bm25 import term_scores

    out = qparser_search(index, "{!maxscore}table^2 vector", k=10)
    s = term_scores(index, ["table", "vector"])
    per = s.groupBy("docid").agg(
        F.max(F.when(F.col("term") == "table", F.col("score"))).alias("a"),
        F.max(F.when(F.col("term") == "vector", F.col("score"))).alias("b"),
    )
    expect = (
        per.select(
            "docid",
            F.round(
                F.greatest(
                    F.coalesce(F.col("a"), F.lit(0.0)) * 2.0,
                    F.coalesce(F.col("b"), F.lit(0.0)),
                ),
                4,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(10)
    )
    assert _pairs(out) == _pairs(expect)


def test_local_params_quoted_brace():
    t, p, b = parse_local_params("{!term f=lang v='a}b'}ignored")
    assert (t, p["f"], b) == ("term", "lang", "a}b")


def test_complexphrase_multi_token_word(index):
    from lucene_solr_spark.search import PhraseQuery, search

    # 'table-scan' analyzes to two tokens -> a 2-position chain, same as the
    # exact phrase
    out = qparser_search(index, '{!complexphrase}"table-scan"', k=10)
    expect = search(index, PhraseQuery(("table", "scan")), k=10)
    assert _pairs(out) == _pairs(expect)


def test_local_params_roundtrip_property():
    """Render random local-params strings and parse them back: type, every
    k=v pair, and the body must round-trip exactly."""
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    key = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8)
    # values: quotable arbitrary text (no quote chars mixed — pick quoting to
    # match), or bare tokens without whitespace/quotes/braces
    bare = st.text(
        alphabet=string.ascii_letters + string.digits + ".,-*", min_size=1, max_size=10
    )
    quoted = st.text(
        alphabet=string.ascii_letters + string.digits + " }{.,-*", min_size=0, max_size=12
    ).filter(lambda s: "'" not in s)
    qtype = st.sampled_from(["term", "terms", "frange", "lucene", "maxscore"])
    body = st.text(
        alphabet=string.ascii_letters + string.digits + " .-*", max_size=20
    )

    @settings(max_examples=200, deadline=None)
    @given(
        t=qtype,
        params=st.dictionaries(key, st.one_of(bare, quoted), max_size=4),
        b=body,
    )
    def prop(t, params, b):
        params = {k: v for k, v in params.items() if k not in ("type", "v")}
        rendered = (
            "{!" + t
            + "".join(f" {k}='{v}'" for k, v in params.items())
            + "}" + b
        )
        pt, pp, pb = parse_local_params(rendered)
        assert pt == t
        assert pp == params
        assert pb == b.strip()

    prop()


# --- round-3 plugins: query/switch/raw/simple/parent/child -----------------


def test_nested_query_deref(index):
    """NestedQParserPlugin: {!query v=$nq} resolves the request param and
    delegates — the fq-templating front door."""
    req = {"nq": "{!frange l=2 u=5}div(n_chars,100)"}
    out = qparser_search(index, "{!query v=$nq}", k=20, req=req)
    expect = qparser_search(index, "{!frange l=2 u=5}div(n_chars,100)", k=20)
    assert _pairs(out) == _pairs(expect)
    with pytest.raises(ValueError, match="undefined request param"):
        qparser_search(index, "{!query v=$missing}", k=5)


def test_switch_qparser(index):
    en = qparser_search(index, "{!term f=lang}en", k=10)
    # input selects case.<input>
    out = qparser_search(
        index, "{!switch case.a='{!term f=lang}en' default='table'}a", k=10
    )
    assert _pairs(out) == _pairs(en)
    # empty input -> the bare `case` param
    out2 = qparser_search(index, "{!switch case='{!term f=lang}en'}", k=10)
    assert _pairs(out2) == _pairs(en)
    # unmatched input -> default
    de = qparser_search(index, "{!term f=lang}de", k=10)
    out3 = qparser_search(
        index, "{!switch case.a='table' default='{!term f=lang}de'}other", k=10
    )
    assert _pairs(out3) == _pairs(de)
    with pytest.raises(ValueError, match="no case"):
        qparser_search(index, "{!switch case.a='table'}b", k=5)


def test_raw_qparser(index):
    out = qparser_search(index, "{!raw f=lang}en", k=10)
    expect = qparser_search(index, "{!term f=lang}en", k=10)
    assert _pairs(out) == _pairs(expect)
    # no analysis: an uppercase body matches nothing on a lowercased index
    assert _pairs(qparser_search(index, "{!raw f=text}Table", k=5)) == []
    with pytest.raises(ValueError, match="needs f"):
        qparser_search(index, "{!raw}table", k=5)


def test_simple_qparser(index):
    from lucene_solr_spark.search.bm25 import search_parsed

    out = qparser_search(index, "{!simple}table merge", k=10)
    assert _pairs(out) == _pairs(search_parsed(index, "table merge", k=10))
    # infix + normalizes to the default operator
    assert _pairs(qparser_search(index, "{!simple}table+merge", k=10)) == _pairs(out)
    # q.op=AND + '-' negation route through the classic executor
    out3 = qparser_search(index, "{!simple q.op=AND}table -slow", k=10)
    assert _pairs(out3) == _pairs(
        search_parsed(index, "table -slow", k=10, default_op="AND")
    )
    # never-throws contract: broken syntax degrades to literal terms
    broken = qparser_search(index, "{!simple}table (((", k=10)
    assert _pairs(broken) == _pairs(search_parsed(index, "table", k=10))


@pytest.fixture(scope="module")
def block_index(spark):
    """Nested-document block analog: children carry their parent's docid in
    a docvalues column (null on parents)."""
    from lucene_solr_spark.index.builder import build_index

    rows = [
        (0, "parent alpha doc", None),
        (1, "child table fast", 0),
        (2, "child table table slow", 0),
        (3, "parent beta doc", None),
        (4, "child merge table", 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, parent_docid long")
    return build_index(
        spark, df, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False,
        passthrough_cols=("parent_docid",),
    )


def test_parent_qparser_rolls_up(spark, block_index):
    out = qparser_search(
        block_index, "{!parent key=parent_docid score=max}table", k=10
    )
    got = _pairs(out)
    assert [d for d, _ in got] == sorted(
        [d for d, _ in got], key=lambda d: [g[0] for g in got].index(d)
    )
    assert {d for d, _ in got} == {0, 3}
    # max over children: parent 0's best child is doc 2 (tf=2)
    from lucene_solr_spark.search.bm25 import _boolean_topk
    from lucene_solr_spark.search.query import BooleanQuery

    child_scores = {
        r.docid: r.score
        for r in _boolean_topk(
            block_index, BooleanQuery.of(should=["table"]), 10, 10
        ).collect()
    }
    want0 = round(max(child_scores[1], child_scores[2]), 4)
    assert dict(got)[0] == want0


def test_child_qparser_fans_out(spark, block_index):
    out = qparser_search(block_index, "{!child key=parent_docid}alpha", k=10)
    got = _pairs(out)
    assert {d for d, _ in got} == {1, 2}
    # both children inherit THE PARENT's score (equal)
    assert len({s for _, s in got}) == 1
    with pytest.raises(ValueError, match="key column"):
        qparser_search(block_index, "{!parent key=nosuch}table", k=5)
