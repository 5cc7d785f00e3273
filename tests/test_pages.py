"""Pages pipeline: north-rule input shape, extraction byte-identity,
parallelism-invariant docid assignment, end-to-end index-over-pages vs the
DuckDB oracle replaying the same pipeline."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    from lucene_solr_spark.pages import pages_from_documents

    return pages_from_documents(spark, sf_dir).persist()


def test_pages_shape(pages):
    assert [ (f.name, f.dataType.simpleString()) for f in pages.schema.fields ] == [
        ("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
        ("text", "string"), ("lang", "string"),
    ]
    n = pages.count()
    assert n > 0
    assert pages.select("url").distinct().count() == n


def test_extraction_byte_identity(pages):
    from lucene_solr_spark.pages import verify_extraction

    assert verify_extraction(pages) == 0


def test_extraction_violation_detected(spark):
    from lucene_solr_spark.pages import verify_extraction

    bad = spark.createDataFrame(
        [("u1", bytearray(b"<html><body><p>other</p></body></html>"), "expected")],
        "url string, html binary, text string",
    )
    assert verify_extraction(bad) == 1


def test_docid_assignment_matches_python_oracle(pages):
    """partition = int(md5(url)[:15hex],16) % P; local = rank by url."""
    from lucene_solr_spark.pages import assign_page_docids

    P = 8
    got = {
        r.url: (r.index_partition, r.docid)
        for r in assign_page_docids(pages, P).select("url", "index_partition", "docid").collect()
    }
    urls = sorted(got)
    by_pid: dict[int, list[str]] = {}
    for u in urls:  # sorted order = rank order within each partition
        pid = int(hashlib.md5(u.encode()).hexdigest()[:15], 16) % P
        by_pid.setdefault(pid, []).append(u)
    for pid, us in by_pid.items():
        for local, u in enumerate(us):
            assert got[u] == (pid, (pid << 32) | local), u


def test_docid_parallelism_invariance(pages):
    """Same docids regardless of input partitioning (local[8] vs local[32]
    stand-in: shard invariance, SURVEY.md §5)."""
    from lucene_solr_spark.pages import assign_page_docids

    a = {
        r.url: r.docid
        for r in assign_page_docids(pages.repartition(3), 8).select("url", "docid").collect()
    }
    b = {
        r.url: r.docid
        for r in assign_page_docids(pages.repartition(13), 8).select("url", "docid").collect()
    }
    assert a == b


@pytest.fixture(scope="module")
def pages_index(spark, pages):
    from lucene_solr_spark.pages import build_index_from_pages

    return build_index_from_pages(spark, pages, num_index_partitions=8)


def test_pages_index_end_to_end_vs_duckdb(pages_index, sf_dir):
    """Full-pipeline differential test: Spark (html->extract->tokenize->index->
    BM25 top-10) vs DuckDB replaying docid assignment + analysis + scoring
    from the documents view (BaseDistributedSearchTestCase control-collection
    pattern)."""
    from lucene_solr_spark.oracle.sqlgen import prelude_sql, score_cols_sql, scored_from
    from lucene_solr_spark.pages import pages_docmap_sql
    from lucene_solr_spark.search import search

    got = [(r.docid, r.score) for r in search(pages_index, "table", k=10).collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sql = f"""{prelude_sql(pages_docmap_sql(8))}
SELECT f.docid, round({score_cols_sql()}, 4) AS score
{scored_from()}
WHERE f.term = 'table'
ORDER BY score DESC, f.docid ASC LIMIT 10"""
    expected = [(r[0], r[1]) for r in con.execute(sql).fetchall()]
    assert got == expected


def test_pages_index_wand_matches_catalyst(pages_index):
    from lucene_solr_spark.search import BooleanQuery, search
    from lucene_solr_spark.search.wand import wand_search

    q = BooleanQuery.of(must=["table"], should=["merge", "scan"])
    a = [(r.docid, r.score) for r in search(pages_index, q, k=10).collect()]
    b = [(r.docid, r.score) for r in wand_search(pages_index, q, k=10).collect()]
    assert a == b


def test_pages_docs_norms_match_documents_index(spark, pages_index, sf_dir):
    """The extracted text tokenizes identically to the source text: per-doc
    num_terms/norm_byte distributions must match the documents-table index."""
    from lucene_solr_spark.index.builder import build_index

    docs_src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = build_index(
        spark, docs_src, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, persist=False,
    )
    a = sorted(
        (r.num_terms, r.norm_byte, r.n)
        for r in pages_index.docs.groupBy("num_terms", "norm_byte")
        .agg(F.count("*").alias("n")).collect()
    )
    b = sorted(
        (r.num_terms, r.norm_byte, r.n)
        for r in base.docs.groupBy("num_terms", "norm_byte")
        .agg(F.count("*").alias("n")).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# facet polish: missing bucket, range include/other flags, expand, distinct
# ---------------------------------------------------------------------------

def test_facet_field_missing_bucket(spark):
    from lucene_solr_spark.facets import facet_field

    rows = [(1, "en"), (2, "en"), (3, None), (4, "fr"), (5, None)]
    df = spark.createDataFrame(rows, "docid long, lang string")
    got = {
        (r.facet_term, r.facet_count)
        for r in facet_field(df, "lang", missing=True).collect()
    }
    assert got == {("en", 2), ("fr", 1), (None, 2)}


def test_facet_range_extended_include_upper_and_others(spark):
    from lucene_solr_spark.facets import facet_range_extended

    rows = [(v,) for v in [50, 100, 101, 200, 250, 300, 301, 500]]
    df = spark.createDataFrame(rows, "v long")
    got = {
        (r.bucket, r.facet_count)
        for r in facet_range_extended(
            df, "v", start=100, end=300, gap=100,
            include_upper=True, others=("before", "after", "between"),
        ).collect()
    }
    # (100,200]: 101,200 ; (200,300]: 250,300 ; before: <=100 (50,100) ;
    # after: >300 (301,500) ; between: 4
    assert got == {
        ("100", 2), ("200", 2), ("before", 2), ("after", 2), ("between", 4)
    }


def test_expand_component_returns_hidden_members(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.facets import collapse, expand_component

    rows = [
        (1, "a", 9.0), (2, "a", 7.0), (3, "a", 5.0), (4, "a", 3.0),
        (5, "b", 8.0), (6, "b", 6.0),
        (7, "c", 4.0),
    ]
    df = spark.createDataFrame(rows, "docid long, grp string, score double")
    order = [F.col("score").desc(), F.col("docid").asc()]
    heads = {r.docid for r in collapse(df, "grp", order).collect()}
    assert heads == {1, 5, 7}
    exp = expand_component(df, "grp", order, expand_rows=2)
    got = {(r.grp, r.docid, r.expand_rank) for r in exp.collect()}
    # group a: ranks 2,3 (docids 2,3; 4 beyond expand_rows); b: rank 2; c: none
    assert got == {("a", 2, 2), ("a", 3, 3), ("b", 6, 2)}


def test_stats_component_calcdistinct(spark):
    from lucene_solr_spark.facets import stats_component

    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (3,)], "v long")
    row = stats_component(df, "v", calcdistinct=True).collect()[0]
    assert row.stats_distinct == 3 and row.stats_count == 5


def test_facet_field_missing_counts_ignore_prefix(spark):
    from lucene_solr_spark.facets import facet_field

    df = spark.createDataFrame(
        [("apple",), ("apricot",), ("banana",), (None,), (None,)],
        "f string",
    )
    rows = facet_field(df, "f", prefix="a", missing=True, sort="index").collect()
    terms = [(r.facet_term, r.facet_count) for r in rows]
    # prefix filters the TERM rows; the missing bucket still counts ALL nulls
    assert terms == [("apple", 1), ("apricot", 1), (None, 2)]


def test_facet_range_extended_fractional_gap(spark):
    from lucene_solr_spark.facets import facet_range_extended

    df = spark.createDataFrame([(0.2,), (0.7,), (0.8,)], "v double")
    got = {
        r.bucket: r.facet_count
        for r in facet_range_extended(df, "v", start=0.0, end=1.0, gap=0.5).collect()
    }
    # 0.0 and 0.5 must stay distinct buckets (a long cast would merge them)
    assert got == {"0.0": 1, "0.5": 2}


def test_multimodal_null_payload_rows_skipped(spark):
    from lucene_solr_spark.textops.multimodal import decode_media, sample_frames

    df = spark.createDataFrame(
        [("u1", b"payload"), ("u2", None)], "url string, html binary"
    )
    assert [r.url for r in decode_media(df).collect()] == ["u1"]
    frames = sample_frames(df, n_frames=2).collect()
    assert {r.url for r in frames} == {"u1"} and len(frames) == 2


def test_function_query_ms_keeps_millis(spark):
    from lucene_solr_spark.functions import parse_function_query

    df = spark.sql("SELECT timestamp'2026-01-01 00:00:00.250' AS ts")
    col = parse_function_query("ms(NOW,ts)", now_epoch_ms=1767225601000)
    # 2026-01-01T00:00:01Z minus ...00.250 = 750 ms (a seconds-truncating
    # implementation would report 1000)
    assert df.select(col.alias("d")).collect()[0].d == 750


def test_maintain_store_rejects_nonprogressing_merge_width(spark, tmp_path):
    import pytest as _pt

    from lucene_solr_spark.streaming import maintain_store

    with _pt.raises(ValueError, match="max_merge_at_once"):
        maintain_store(spark, str(tmp_path / "nostore"), max_merge_at_once=1)
