"""FilterCache + getProcessedFilter: cache bookkeeping, persist lifecycle,
smallest-first positive intersection, pure-negative complements."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.filtercache import FilterCache


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    from lucene_solr_spark.driver_queries import get_index

    return get_index(spark, sf_dir)


def _brute(index, must=(), must_not=()):
    p = index.postings
    out = None
    for t in must:
        m = p.filter(F.col("term") == t).select("docid").distinct()
        out = m if out is None else out.join(m, "docid", "left_semi")
    if out is None:
        out = index.docs.select("docid")
    for t in must_not:
        m = p.filter(F.col("term") == t).select("docid").distinct()
        out = out.join(m, "docid", "left_anti")
    return {r.docid for r in out.collect()}


def test_filtered_matches_brute_and_counts(index):
    fc = FilterCache(index)
    got = {r.docid for r in fc.filtered(["table", "merge", "-slow"]).collect()}
    assert got == _brute(index, must=["table", "merge"], must_not=["slow"])
    s = fc.stats()
    assert s == {"lookups": 3, "hits": 0, "misses": 3, "evictions": 0, "size": 3}
    fc.filtered(["table", "merge"])  # both cached now
    assert fc.stats()["hits"] == 2 and fc.stats()["size"] == 3
    fc.clear()


def test_pure_negative_only_complements_all_docs(index):
    fc = FilterCache(index)
    got = fc.filtered(["-table"]).count()
    with_t = index.postings.filter(F.col("term") == "table").select("docid").distinct().count()
    assert got == index.max_doc - with_t
    with pytest.raises(ValueError, match="pure-negative"):
        fc.docset("-table")
    fc.clear()


def test_eviction_unpersists_exact_frame(index):
    fc = FilterCache(index, max_size=2)
    a = fc.docset("table")
    fc.docset("merge")
    fc.docset("vector")  # evicts 'table'
    assert fc.stats()["evictions"] == 1 and fc.stats()["size"] == 2
    assert not a.storageLevel.useMemory  # the evicted handle is unpersisted
    b = fc.docset("merge")
    assert b.storageLevel.useMemory
    fc.clear()
    assert not b.storageLevel.useMemory


def test_cache_reuses_same_frame(index):
    fc = FilterCache(index)
    a, b = fc.docset("table"), fc.docset("table")
    assert a is b
    assert fc.stats()["hits"] == 1
    fc.clear()


def test_search_filtered_scores_from_q_only(index):
    """getDocListNC: fq restricts, never scores; top-k applies after."""
    from lucene_solr_spark.search.bm25 import _boolean_topk
    from lucene_solr_spark.search.filtercache import search_filtered
    from lucene_solr_spark.search.query import BooleanQuery

    out = search_filtered(index, "table merge", ["merge", "-slow"], k=10)
    got = [(r.docid, r.score) for r in out.collect()]
    scored = _boolean_topk(index, BooleanQuery.of(should=["table", "merge"]), 10, 4)
    allowed = _brute(index, must=["merge"], must_not=["slow"])
    expect = sorted(
        ((r.docid, r.score) for r in scored.collect() if r.docid in allowed),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == expect


def test_search_filtered_reuses_supplied_cache(index):
    from lucene_solr_spark.search.filtercache import FilterCache, search_filtered

    fc = FilterCache(index)
    search_filtered(index, "table", ["merge"], cache=fc, k=5).collect()
    search_filtered(index, "vector", ["merge"], cache=fc, k=5).collect()
    assert fc.stats()["hits"] == 1  # the merge DocSet served from cache
    fc.clear()


def test_local_params_fq(index):
    """fq accepts qparsers: {!frange} and {!term f=...} produce DocSets that
    intersect like any other filter."""
    from lucene_solr_spark.search.filtercache import search_filtered

    out = search_filtered(
        index, "table", ["{!frange l=2 u=5}div(n_chars,100)", "{!term f=lang}en"],
        k=10,
    )
    got = {r.docid for r in out.collect()}
    col = F.col("n_chars") / F.lit(100)
    allowed = {
        r.docid
        for r in index.docs.filter(
            (col >= 2) & (col <= 5) & (F.col("lang") == "en")
        ).collect()
    }
    assert got <= allowed and got
    with pytest.raises(ValueError, match="unsupported filter qparser"):
        search_filtered(index, "table", ["{!boost b=log(n_chars)}x"])


def test_frange_fq_pinned_now(index):
    """The fq-side {!frange} honours the per-request pinned NOW exactly like
    the q-side _frange_qparser, and NOW participates in the cache key (the
    same fq string under two NOWs is two DocSets)."""
    fc = FilterCache(index)
    fq = "{!frange l=1}ms(NOW)"
    with pytest.raises(ValueError, match="now_epoch_ms"):
        fc.docset(fq)  # unpinned NOW must fail, not silently misbehave
    fc.clear()

    fc = FilterCache(index)
    a = fc.docset(fq, now_epoch_ms=1_000)
    assert a.count() == index.max_doc  # NOW=1000 >= 1: every doc passes
    fc.docset(fq, now_epoch_ms=2_000)
    assert fc.stats()["misses"] == 2  # distinct NOW -> distinct entry
    fc.docset(fq, now_epoch_ms=1_000)
    assert fc.stats()["hits"] == 1
    fc.clear()


# --- round-3b: {!collapse} post-filter + group.query ---


def test_collapse_postfilter_by_score(spark, index):
    """fq={!collapse field=lang}: one doc per lang, the highest-scoring one
    (CollapsingQParserPlugin default selector)."""
    from lucene_solr_spark.search.filtercache import search_filtered

    got = search_filtered(
        index, "table", fqs=["{!collapse field=lang}"], k=50
    ).collect()
    assert got
    # group uniqueness
    langs = {}
    doc_lang = {
        r.docid: r.lang for r in index.docs.select("docid", "lang").collect()
    }
    for r in got:
        lg = doc_lang[r.docid]
        assert lg not in langs, (lg, r)
        langs[lg] = (r.docid, r.score)
    # each kept doc is the group's best (score desc, docid asc)
    from lucene_solr_spark.search import BooleanQuery, search

    allhits = search(index, BooleanQuery.of(must=["table"]), k=10**6).collect()
    best = {}
    for r in sorted(allhits, key=lambda r: (-r.score, r.docid)):
        lg = doc_lang[r.docid]
        best.setdefault(lg, (r.docid, r.score))
    for lg, pair in langs.items():
        assert best[lg] == pair


def test_collapse_min_selector(spark, index):
    """{!collapse field=lang min=n_chars}: keep the group's shortest doc."""
    from lucene_solr_spark.search.filtercache import search_filtered

    got = search_filtered(
        index, "table", fqs=["{!collapse field=lang min=n_chars}"], k=50
    ).collect()
    assert got
    from lucene_solr_spark.search import BooleanQuery, search

    meta = {
        r.docid: (r.lang, r.n_chars)
        for r in index.docs.select("docid", "lang", "n_chars").collect()
    }
    allhits = search(index, BooleanQuery.of(must=["table"]), k=10**6).collect()
    best = {}
    for r in sorted(allhits, key=lambda r: (meta[r.docid][1], r.docid)):
        best.setdefault(meta[r.docid][0], r.docid)
    assert {meta[r.docid][0]: r.docid for r in got} == best


def test_collapse_composes_with_docset_fq(spark, index):
    from lucene_solr_spark.search.filtercache import search_filtered

    got = search_filtered(
        index, "table",
        fqs=["{!term f=lang}en", "{!collapse field=source}"], k=50,
    ).collect()
    doc_meta = {
        r.docid: (r.lang, r.source)
        for r in index.docs.select("docid", "lang", "source").collect()
    }
    assert got
    seen = set()
    for r in got:
        lang, src = doc_meta[r.docid]
        assert lang == "en"
        assert src not in seen
        seen.add(src)


def test_group_queries(spark, index):
    from lucene_solr_spark.facets.facets import group_queries
    from lucene_solr_spark.search import BooleanQuery, search

    frames = {
        "q_table": search(index, BooleanQuery.of(must=["table"]), k=10**6),
        "q_vector": search(index, BooleanQuery.of(must=["vector"]), k=10**6),
    }
    out = group_queries(frames, k_per_group=3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.group_query, []).append((r.docid, r.score))
    assert set(by_group) == {"q_table", "q_vector"}
    for name, frame in frames.items():
        want = [
            (r.docid, r.score)
            for r in frame.orderBy(F.desc("score"), F.asc("docid")).limit(3).collect()
        ]
        assert sorted(by_group[name]) == sorted(want)


def test_collapse_null_policy(spark):
    """nullPolicy=ignore/expand/collapse (CollapsingQParserPlugin
    NULL_IGNORE/NULL_EXPAND/NULL_COLLAPSE)."""
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.filtercache import search_filtered

    docs = spark.createDataFrame(
        [
            (0, "table scan", "en"),
            (1, "table merge", "en"),
            (2, "table plan", None),
            (3, "table join", None),
        ],
        "doc_id long, text string, lang string",
    )
    idx = build_index(spark, docs, key_col="doc_id", docid_col="doc_id",
                      num_index_partitions=2, passthrough_cols=("lang",))

    def run(policy):
        return sorted(
            r.docid
            for r in search_filtered(
                idx, "table",
                fqs=[f"{{!collapse field=lang nullPolicy={policy}}}"], k=50,
            ).collect()
        )

    en_best = run("ignore")
    assert len(en_best) == 1          # nulls dropped, one per group
    assert set(en_best) <= {0, 1}

    expanded = run("expand")
    assert set(expanded) == set(en_best) | {2, 3}   # nulls pass uncollapsed

    collapsed = run("collapse")
    assert len(collapsed) == 2        # en group + the single null group
    assert set(en_best) <= set(collapsed)
    assert len(set(collapsed) & {2, 3}) == 1

    import pytest as _p
    with _p.raises(ValueError, match="nullPolicy"):
        run("bogus")


def test_collapse_max_cscore_equals_default(spark, index):
    """{!collapse field=lang max=cscore()} == the default score selector
    (CollapseScoreFunction: cscore() IS the doc's query score inside the
    collapse, ValueSourceParser.java:226-231)."""
    from lucene_solr_spark.search.filtercache import search_filtered

    via_func = search_filtered(
        index, "table", fqs=["{!collapse field=lang max=cscore()}"], k=50
    ).collect()
    default = search_filtered(
        index, "table", fqs=["{!collapse field=lang}"], k=50
    ).collect()
    assert [(r.docid, r.score) for r in via_func] == [
        (r.docid, r.score) for r in default
    ]


def test_collapse_max_function_selector(spark, index):
    """{!collapse field=lang max=sub(0,n_chars)} picks the group's
    SHORTEST doc — i.e. behaves exactly like min=n_chars (the selector
    compiles through the function registry, docs columns joined in)."""
    from lucene_solr_spark.search.filtercache import search_filtered

    got = search_filtered(
        index, "table",
        fqs=["{!collapse field=lang max=sub(0,n_chars)}"], k=50,
    ).collect()
    want = search_filtered(
        index, "table", fqs=["{!collapse field=lang min=n_chars}"], k=50
    ).collect()
    assert sorted(r.docid for r in got) == sorted(r.docid for r in want)


def test_with_joindf(spark, index):
    """joindf: the doc's lang value looked up as a term in the index
    dictionary (JoinDocFreqValueSource) — e.g. docs with lang='en' get
    df('en') when 'en' occurs as an indexed term, else 0."""
    from lucene_solr_spark.functions.value_sources import with_joindf

    out = with_joindf(
        index.docs.select("docid", "lang"), index, "lang", out="jdf"
    )
    got = {r.docid: r.jdf for r in out.collect()}
    dfs = {r.term: r.df for r in index.segments.select("term", "df").collect()}
    langs = {r.docid: r.lang for r in index.docs.select("docid", "lang").collect()}
    for docid, jdf in got.items():
        assert jdf == dfs.get(langs[docid], 0)
    assert any(v > 0 for v in got.values()) or all(
        lang not in dfs for lang in set(langs.values())
    )


def test_cache_false_bypasses_cache(spark, sf_dir):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.filtercache import FilterCache

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )
    fc = FilterCache(idx)
    base = {int(r.docid) for r in fc.docset("table").collect()}
    # cache=false: same DocSet, but no cache entry / no hits recorded
    before = fc.stats()
    nc = {int(r.docid) for r in fc.docset("{!cache=false}table").collect()}
    nc2 = {int(r.docid) for r in fc.docset("{!cache=false}table").collect()}
    after = fc.stats()
    assert nc == base == nc2
    assert after["size"] == before["size"]
    assert after["lookups"] == before["lookups"]
    # composed with cached filters it applies last (post-filter position)
    out = {
        int(r.docid)
        for r in fc.filtered(["table", "{!cache=false cost=150}merge"]).collect()
    }
    want = base & {int(r.docid) for r in fc.docset("merge").collect()}
    assert out == want
