"""Persistent store: snapshot commits, crash/resume, loaded-index equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    from lucene_solr_spark.pages import pages_from_documents

    return pages_from_documents(spark, sf_dir).persist()


@pytest.fixture(scope="module")
def mem_index(spark, pages):
    from lucene_solr_spark.pages import build_index_from_pages

    return build_index_from_pages(spark, pages, num_index_partitions=8)


def _topk(index, q, k=10):
    from lucene_solr_spark.search import search

    return [(r.docid, r.score) for r in search(index, q, k=k).collect()]


def test_store_roundtrip_equals_memory_build(spark, pages, mem_index, tmp_path):
    from lucene_solr_spark.search.wand import wand_search
    from lucene_solr_spark.store import build_pages_to_store, load_index

    root = str(tmp_path / "idx")
    snap = build_pages_to_store(spark, pages, root, num_index_partitions=8)
    assert snap.snapshot_id == 1
    assert snap.max_doc == mem_index.max_doc
    assert snap.sum_total_term_freq == mem_index.sum_total_term_freq

    loaded = load_index(spark, root)
    assert loaded.avgdl == mem_index.avgdl
    # Catalyst path over decoded-postings view
    assert _topk(loaded, "table") == _topk(mem_index, "table")
    # WAND path directly over the stored compressed segments
    got = [(r.docid, r.score) for r in wand_search(loaded, "table", k=10).collect()]
    assert got == _topk(mem_index, "table")
    # facet source intact
    assert (
        loaded.docs.groupBy("lang").count().sort("lang").collect()
        == mem_index.docs.groupBy("lang").count().sort("lang").collect()
    )


def test_store_positions_phrase_and_span_equal_memory(spark, pages, tmp_path):
    """The persisted positions layer (Lucene41 .pos analog): phrase, sloppy
    and span queries over a LOADED store equal the in-memory positions
    index."""
    from lucene_solr_spark.pages import build_index_from_pages
    from lucene_solr_spark.search import PhraseQuery
    from lucene_solr_spark.search.bm25 import span_near_topk
    from lucene_solr_spark.store import build_pages_to_store, load_index

    mem = build_index_from_pages(
        spark, pages, num_index_partitions=8, build_positions=True
    )
    root = str(tmp_path / "idx_pos")
    build_pages_to_store(spark, pages, root, num_index_partitions=8)
    loaded = load_index(spark, root)
    assert loaded.positions is not None

    for q in (PhraseQuery(("table", "scan")), PhraseQuery(("table", "scan"), slop=2)):
        assert _topk(loaded, q) == _topk(mem, q)
    got = [
        (r.docid, r.score)
        for r in span_near_topk(loaded, ["table", "scan"], slop=1)
        .orderBy(F.col("score").desc(), F.col("docid").asc()).limit(10).collect()
    ]
    want = [
        (r.docid, r.score)
        for r in span_near_topk(mem, ["table", "scan"], slop=1)
        .orderBy(F.col("score").desc(), F.col("docid").asc()).limit(10).collect()
    ]
    assert got == want


def test_store_without_positions_loads_none(spark, pages, tmp_path):
    from lucene_solr_spark.store import build_pages_to_store, load_index

    root = str(tmp_path / "idx_nopos")
    build_pages_to_store(
        spark, pages, root, num_index_partitions=8, build_positions=False
    )
    assert load_index(spark, root).positions is None


def test_crash_resume_recovers_exactly(spark, pages, mem_index, tmp_path):
    from lucene_solr_spark.store import (
        IndexStore,
        SimulatedFailure,
        build_pages_to_store,
        load_index,
    )

    root = str(tmp_path / "idx2")
    with pytest.raises(SimulatedFailure):
        build_pages_to_store(
            spark, pages, root, num_index_partitions=8,
            batch_size=3, fail_after_batches=1,
        )
    store = IndexStore(root)
    committed1 = store.committed_partitions()
    assert len(committed1) == 3  # only the first batch survived

    # a reader at the crash point sees a consistent partial index
    partial = load_index(spark, root)
    n_partial = partial.docs.count()
    assert 0 < n_partial < mem_index.max_doc
    assert partial.max_doc == n_partial

    # resume: rebuilds ONLY the missing partitions
    snap = build_pages_to_store(
        spark, pages, root, num_index_partitions=8, batch_size=3
    )
    assert set(snap.committed_partitions) == set(range(8))
    assert snap.max_doc == mem_index.max_doc
    assert snap.sum_total_term_freq == mem_index.sum_total_term_freq

    lineage = store.lineage(spark)
    # resumed build never re-attempted the first batch's partitions
    per_pid = {
        r.index_partition: r.cnt
        for r in lineage.groupBy("index_partition")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(per_pid) == set(range(8))
    assert all(c == 1 for c in per_pid.values())
    assert lineage.filter(F.col("status") == "committed").count() == 8

    final = load_index(spark, root)
    assert _topk(final, "table") == _topk(mem_index, "table")
    from lucene_solr_spark.search import BooleanQuery

    q = BooleanQuery.of(must=["table"], should=["merge", "scan"])
    assert _topk(final, q) == _topk(mem_index, q)


def test_rerun_on_complete_store_is_noop(spark, pages, tmp_path):
    from lucene_solr_spark.store import build_pages_to_store

    root = str(tmp_path / "idx3")
    s1 = build_pages_to_store(spark, pages, root, num_index_partitions=4)
    s2 = build_pages_to_store(spark, pages, root, num_index_partitions=4)
    assert s2.snapshot_id == s1.snapshot_id  # nothing to do, no new snapshot


def test_snapshot_commit_is_atomic(tmp_path):
    from lucene_solr_spark.store.store import IndexStore, Snapshot

    store = IndexStore(str(tmp_path / "s"))
    assert store.head() is None
    snap = Snapshot(
        snapshot_id=1, parent_id=None, committed_partitions=[0, 1],
        num_index_partitions=4, max_doc=10, sum_total_term_freq=100,
    )
    store.commit(snap)
    h = store.head()
    assert h.snapshot_id == 1 and h.committed_partitions == [0, 1]
    assert h.avgdl == 10.0
    snap2 = Snapshot(
        snapshot_id=2, parent_id=1, committed_partitions=[0, 1, 2],
        num_index_partitions=4, max_doc=15, sum_total_term_freq=160,
    )
    store.commit(snap2)
    assert store.head().snapshot_id == 2
    assert store.head().parent_id == 1


def test_multifield_store_roundtrip(spark, sf_dir, tmp_path):
    """Persisted multi-field schema: field-routed and dismax queries over the
    LOADED schema equal the in-memory multi-field build."""
    from lucene_solr_spark.index.fields import (
        build_multifield_index,
        dismax_fields,
        search_parsed_fields,
    )
    from lucene_solr_spark.store import build_multifield_store, load_multifield_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fexprs = {"body": "text", "title": F.substring("text", 1, 40)}
    mem = build_multifield_index(
        spark, docs, key_col="doc_id", field_exprs=fexprs,
        default_field="body", docid_col="doc_id", num_index_partitions=4,
        build_positions=True,
    )
    root = str(tmp_path / "mf")
    build_multifield_store(
        spark, docs, root, key_col="doc_id", field_exprs=fexprs,
        default_field="body", docid_col="doc_id", num_index_partitions=4,
    )
    loaded = load_multifield_index(spark, root)
    assert sorted(loaded.fields) == ["body", "title"]
    assert loaded.of("title").avgdl == mem.of("title").avgdl

    def rows(mfi, q):
        return [(r.docid, r.score) for r in search_parsed_fields(mfi, q, k=10).collect()]

    for q in ("scan title:merge", 'title:"table scan"', "scan"):
        assert rows(loaded, q) == rows(mem, q), q
    got = [(r.docid, r.score) for r in dismax_fields(
        loaded, ["table", "scan"], qf={"title": 2.0, "body": 1.0}, tie=0.3).collect()]
    want = [(r.docid, r.score) for r in dismax_fields(
        mem, ["table", "scan"], qf={"title": 2.0, "body": 1.0}, tie=0.3).collect()]
    assert got == want


def test_multifield_store_rerun_is_noop(spark, sf_dir, tmp_path):
    """A fully-committed multi-field store re-run must not rebuild fields:
    snapshot ids stay at 1 and results are unchanged."""
    import json
    import os

    from lucene_solr_spark.index.fields import search_parsed_fields
    from lucene_solr_spark.store import (
        IndexStore,
        build_multifield_store,
        load_multifield_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fexprs = {"body": "text", "title": F.substring("text", 1, 40)}
    root = str(tmp_path / "mf2")
    for _ in range(2):  # second run resumes over the committed store
        build_multifield_store(
            spark, docs, root, key_col="doc_id", field_exprs=fexprs,
            default_field="body", docid_col="doc_id", num_index_partitions=4,
        )
    for fname in fexprs:
        snap = IndexStore(os.path.join(root, "fields", fname)).head()
        assert snap is not None and snap.snapshot_id == 1
    with open(os.path.join(root, "schema.json")) as f:
        assert json.load(f)["default_field"] == "body"
    loaded = load_multifield_index(spark, root)
    assert search_parsed_fields(loaded, "scan title:merge", k=5).count() > 0
