"""/select facade: the SearchHandler component pipeline end-to-end —
q + fq + sort + paging + fl + facets + highlighting + grouping in one
request, each cross-checked against the standalone operators."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.handler import select


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    from lucene_solr_spark.driver_queries import get_index

    return get_index(spark, sf_dir)


def test_basic_q_matches_search(index):
    from lucene_solr_spark.search import BooleanQuery, search

    out = select(index, {"q": "table", "rows": 10})
    got = [(r.docid, r.score) for r in out["response"].collect()]
    want = [
        (r.docid, r.score)
        for r in search(index, BooleanQuery.of(must=["table"]), k=10).collect()
    ]
    assert got == want
    assert out["num_found"] >= 10


def test_fq_and_paging(index):
    full = select(index, {"q": "table", "fq": ["{!term f=lang}en"], "rows": 20})
    page2 = select(
        index, {"q": "table", "fq": ["{!term f=lang}en"], "start": 5, "rows": 5}
    )
    all_rows = [r.docid for r in full["response"].collect()]
    got = [r.docid for r in page2["response"].collect()]
    assert got == all_rows[5:10]
    langs = {
        r.docid: r.lang for r in index.docs.select("docid", "lang").collect()
    }
    assert all(langs[d] == "en" for d in all_rows)


def test_sort_by_field(index):
    out = select(
        index, {"q": "table", "sort": "n_chars asc", "rows": 8}
    )
    got = [r.docid for r in out["response"].collect()]
    meta = {
        r.docid: r.n_chars for r in index.docs.select("docid", "n_chars").collect()
    }
    assert got == sorted(got, key=lambda d: (meta[d], d))
    assert len(got) == 8


def test_fl_projection(index):
    out = select(
        index,
        {"q": "table", "rows": 5, "fl": "docid, score, language:lang"},
    )
    df = out["response"]
    assert set(df.columns) == {"docid", "score", "language"}
    assert df.count() == 5


def test_facets_over_filtered_set(index):
    from lucene_solr_spark.facets.facets import facet_field

    out = select(
        index,
        {"q": "table", "facet.field": ["lang"], "rows": 3},
    )
    got = [(r.facet_term, r.facet_count) for r in out["facet_fields"]["lang"].collect()]
    from lucene_solr_spark.search import BooleanQuery, search

    base = search(index, BooleanQuery.of(must=["table"]), k=1 << 30).join(
        index.docs.select("docid", "lang"), "docid"
    )
    want = [(r.facet_term, r.facet_count) for r in facet_field(base, "lang").collect()]
    assert got == want


def test_facet_query_counts(index):
    out = select(
        index,
        {"q": "table", "facet.query": {"has_merge": "merge", "has_slow": "slow"}},
    )
    rows = {r.facet_query: r.facet_count for r in out["facet_queries"].collect()}
    assert set(rows) == {"has_merge", "has_slow"}
    assert all(v >= 0 for v in rows.values())


def test_highlighting_page(index, spark, sf_dir):
    stored = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("docid"), "text", "lang", "source", "n_chars"
    )
    out = select(index, {"q": "table", "rows": 5, "hl": "true"}, stored=stored)
    hl = out["highlighting"].collect()
    assert len(hl) == 5
    assert all("<em>" in r.snippet for r in hl)


def test_grouping(index):
    out = select(
        index, {"q": "table", "group.field": "lang", "group.limit": 2}
    )
    rows = out["grouped"].collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r.docid)
    assert per and all(len(v) <= 2 for v in per.values())


def test_collapse_fq_through_facade(index):
    out = select(
        index, {"q": "table", "fq": ["{!collapse field=lang}"], "rows": 20}
    )
    langs = {
        r.docid: r.lang for r in index.docs.select("docid", "lang").collect()
    }
    got = [langs[r.docid] for r in out["response"].collect()]
    assert len(got) == len(set(got))


def test_match_all(index):
    out = select(index, {"q": "*:*", "rows": 3})
    assert out["num_found"] == index.max_doc
    assert out["response"].count() == 3


def test_qparser_front_door(index):
    out = select(index, {"q": "{!term f=lang}en", "rows": 5})
    langs = {
        r.docid: r.lang for r in index.docs.select("docid", "lang").collect()
    }
    assert all(langs[r.docid] == "en" for r in out["response"].collect())


def test_sort_by_function(index):
    """sort=div(n_chars,2) asc — sort-by-function (SortSpecParsing +
    ValueSourceParser): compiles the function over stored fields."""
    out = select(index, {"q": "table", "sort": "div(n_chars,2.0) asc", "rows": 8})
    got = [r.docid for r in out["response"].collect()]
    meta = {
        r.docid: r.n_chars for r in index.docs.select("docid", "n_chars").collect()
    }
    assert got == sorted(got, key=lambda d: (meta[d] / 2.0, d))


def test_multiselect_faceting_tag_ex(index):
    """fq={!term f=lang tag=dt}en + facet.field={!ex=dt}lang: the lang facet
    counts IGNORE the lang filter (multi-select pattern), while the result
    set is still filtered to en."""
    from lucene_solr_spark.handler import select

    out = select(
        index,
        {
            "q": "table",
            "fq": ["{!term f=lang tag=dt}en"],
            "rows": 50,
            "facet.field": ["{!ex=dt key=lang_all}lang", "lang"],
            "numFound": True,
        },
    )
    # response filtered to en
    doc_lang = {
        r.docid: r.lang for r in index.docs.select("docid", "lang").collect()
    }
    for r in out["response"].collect():
        assert doc_lang[r.docid] == "en"
    # tagged-excluded facet sees ALL langs of the unfiltered 'table' set
    ex_counts = {r[0]: r[1] for r in out["facet_fields"]["lang_all"].collect()}
    assert len(ex_counts) > 1
    in_counts = {r[0]: r[1] for r in out["facet_fields"]["lang"].collect()}
    assert set(in_counts) == {"en"}
    assert in_counts["en"] == ex_counts["en"]


def test_sort_missing_last_first(spark):
    """sortMissingLast/First (FieldType SORT_MISSING_LAST/FIRST): docs
    without the sort field land at the chosen end regardless of direction."""
    from lucene_solr_spark.handler import select
    from lucene_solr_spark.index.builder import build_index

    docs = spark.createDataFrame(
        [(0, "table a", 5), (1, "table b", None), (2, "table c", 3)],
        "doc_id long, text string, rank int",
    )
    idx = build_index(spark, docs, key_col="doc_id", docid_col="doc_id",
                      num_index_partitions=2, passthrough_cols=("rank",))

    def order(policy, direction="asc"):
        out = select(idx, {
            "q": "table", "rows": 10, "sort": f"rank {direction}",
            "sortMissing": policy, "numFound": False,
        })
        return [r.docid for r in out["response"].collect()]

    assert order("last") == [2, 0, 1]
    assert order("first") == [1, 2, 0]
    assert order("last", "desc") == [0, 2, 1]
    assert order("first", "desc") == [1, 0, 2]
