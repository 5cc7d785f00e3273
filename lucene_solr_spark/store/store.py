"""Persistent index store: snapshot commits, per-partition lineage, resume.

The Lucene/Solr durability surface re-expressed for shared storage:

- Segment files + ``segments_N`` commit point (SegmentInfos.java:58-80;
  two-phase commit IndexWriter.java:900-916,1094) become per-partition
  Parquet directories plus an atomic snapshot pointer: data files land first,
  then a JSON snapshot manifest is written and ``HEAD`` is swapped with an
  atomic rename.  Readers resolve HEAD -> snapshot -> committed partition
  list, so half-written partitions are invisible — the same
  commit-point-isolation Iceberg provides (this sandbox has no Iceberg
  runtime; the layout is a faithful stand-in and the write/read API would
  map 1:1 onto ``writeTo(...).append()`` + snapshots).
- The transaction log / replay (UpdateLog.java:70-72,381-429) becomes the
  per-partition **lineage table**: one row per build attempt with status,
  row counts, and wall time.  A re-run consults the committed set and
  rebuilds only missing partitions — resumable, idempotent (partition dirs
  are overwritten via dynamic partition overwrite on retry).

Scale shape: each build batch touches only its partitions' source rows
(partition pruning on the hash-routed ``index_partition``), writes are
append-only per partition, and a 1000-executor cluster commits snapshots at
whatever batch cadence bounds recovery time.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables, build_index
from lucene_solr_spark.index.compress import (
    build_compressed_segments,
    compress_positions,
)


class SimulatedFailure(RuntimeError):
    """Raised by tests to model a mid-build crash between snapshot commits."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    committed_partitions: list[int]
    num_index_partitions: int
    max_doc: int
    sum_total_term_freq: int
    # streaming extensions: committed segment generations (one per
    # micro-batch flush) and the next local-docid base per partition
    gens: list[int] | None = None
    doc_bases: dict | None = None
    # highest Structured-Streaming batch id ever committed — the replay
    # watermark.  Kept SEPARATE from ``gens`` because compaction rewrites the
    # gen list (compacted gens use negative ids, outside the batch-id space)
    # while replay detection must keep comparing against batch history.
    max_batch_id: int | None = None
    # delete generations (BufferedUpdates / liveDocs analog): each is a
    # parquet directory of deleted docids under deletes/dgen=<id>, applied as
    # an anti-join at read time.  Collection stats (max_doc, df, avgdl) stay
    # UNCHANGED until compaction, exactly like Lucene segment deletes
    # (IndexWriter.java:256ff — deletes don't rewrite segment stats; merges
    # drop deleted docs physically).
    delete_gens: list[int] | None = None

    @property
    def avgdl(self) -> float:
        if not self.max_doc:
            return 0.0
        return float(np.float32(self.sum_total_term_freq / self.max_doc))


class IndexStore:
    """Filesystem layout + snapshot/lineage bookkeeping for one index."""

    def __init__(self, root: str):
        self.root = root
        self.docs_path = os.path.join(root, "docs")
        self.segments_path = os.path.join(root, "segments")
        self.positions_path = os.path.join(root, "positions")
        self.deletes_path = os.path.join(root, "deletes")
        self.lineage_path = os.path.join(root, "lineage")
        self.metrics_path = os.path.join(root, "metrics")
        self.snapshots_dir = os.path.join(root, "snapshots")
        self.head_path = os.path.join(root, "HEAD")
        os.makedirs(self.snapshots_dir, exist_ok=True)

    # -- snapshot log -------------------------------------------------------

    def head(self) -> Snapshot | None:
        if not os.path.exists(self.head_path):
            return None
        with open(self.head_path) as f:
            sid = int(f.read().strip())
        with open(os.path.join(self.snapshots_dir, f"snap-{sid}.json")) as f:
            d = json.load(f)
        return Snapshot(**d)

    def commit(self, snap: Snapshot) -> None:
        """Two-phase: manifest file first, then atomic HEAD swap
        (IndexWriter.prepareCommit/commit analog)."""
        path = os.path.join(self.snapshots_dir, f"snap-{snap.snapshot_id}.json")
        with open(path, "w") as f:
            json.dump(snap.__dict__, f)
            f.flush()
            os.fsync(f.fileno())
        tmp = self.head_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap.snapshot_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.head_path)

    def committed_partitions(self) -> set[int]:
        snap = self.head()
        return set(snap.committed_partitions) if snap else set()

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_path)

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Per-snapshot build metrics: one row per committed batch —
        the north-rule metrics table next to the per-partition lineage."""
        return spark.read.parquet(self.metrics_path)


def _write_partitioned(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("index_partition")
        .parquet(path)
    )


def build_pages_to_store(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    num_index_partitions: int = 8,
    batch_size: int | None = None,
    fail_after_batches: int | None = None,
    build_positions: bool = True,
) -> Snapshot:
    """Checkpointed, resumable index build over a pages table.

    Partitions are processed in batches; each batch writes its docs +
    compressed-segment partition directories, appends lineage rows, and
    commits a snapshot.  A crash between snapshots loses only the in-flight
    batch; re-running skips everything already committed.
    ``fail_after_batches`` injects a crash for recovery tests.
    """
    from lucene_solr_spark.pages import assign_page_docids, extract_text_expr

    store = IndexStore(root)
    committed = store.committed_partitions()
    todo = [p for p in range(num_index_partitions) if p not in committed]
    if not todo:
        return store.head()

    batch_size = batch_size or num_index_partitions
    # no persist here: each batch reads `assigned` exactly once (build_index
    # caches the post-tokenize docs table, which is far smaller than the
    # extracted text) — caching text-sized data would only add heap traffic
    assigned = (
        assign_page_docids(pages, num_index_partitions)
        .withColumn("extracted", extract_text_expr(F.col("html")))
        .select("docid", "url", "extracted", "lang", "index_partition")
    )

    snap = store.head()
    batches_done = 0
    for i in range(0, len(todo), batch_size):
        batch = todo[i : i + batch_size]
        t0 = time.perf_counter()
        subset = assigned.filter(F.col("index_partition").isin(batch))
        # persist=True: the tokenized docs/postings tables are read 3-4 times
        # below (docs write, compressed-segment build, per-partition stats) —
        # caching them turns the batch into tokenize-once
        idx = build_index(
            spark,
            subset,
            key_col="url",
            text_col="extracted",
            docid_col="docid",
            num_index_partitions=num_index_partitions,
            passthrough_cols=("lang",),
            persist=True,
            build_positions=build_positions,
            persist_positions=False,  # compressed exactly once below
        )
        # The three layer writes are independent jobs over already-materialized
        # caches (build_index's stats agg forced docs + the grouped frame), so
        # submit them concurrently: each job's driver-side tail (commit,
        # file promotion) overlaps the others' executor compute instead of
        # leaving the cluster idle — on a real cluster these are three
        # non-overlapping output tables of the same snapshot.
        writes = [(idx.docs, store.docs_path),
                  (build_compressed_segments(idx, persist=False),
                   store.segments_path)]
        if build_positions and idx.positions is not None:
            # persisted DOCS_AND_FREQS_AND_POSITIONS layer (Lucene41 .pos);
            # the pre-aggregated frame keeps the codec shuffle at ~df rows
            writes.append(
                (compress_positions(idx.positions_grouped or idx.positions),
                 store.positions_path)
            )
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futs = [pool.submit(_write_partitioned, df, path)
                    for df, path in writes]
            for f in futs:
                f.result()
        wall = time.perf_counter() - t0

        sid = (snap.snapshot_id + 1) if snap else 1
        # per-partition doc/term counts come from the SAME stats job that
        # computed max_doc/avgdl inside build_index (partition_stats) — no
        # second aggregate over the docs cache
        per_part = idx.partition_stats or {}
        lineage_rows = [
            (
                int(p),
                "committed",
                int(per_part[p][0]) if p in per_part else 0,
                int(per_part[p][1]) if p in per_part else 0,
                float(wall / len(batch)),
                sid,
            )
            for p in batch
        ]
        spark.createDataFrame(
            lineage_rows,
            "index_partition int, status string, n_docs long, sum_tf long, "
            "wall_s double, snapshot_id int",
        ).write.mode("append").parquet(store.lineage_path)

        # metrics table: one row per snapshot commit (build-level rollup of
        # the lineage rows — n_docs/sum_tf are deterministic, wall/throughput
        # are the operational signals a 1000-executor run would chart)
        b_docs = sum(r[2] for r in lineage_rows)
        b_tf = sum(r[3] for r in lineage_rows)
        spark.createDataFrame(
            [
                (
                    sid,
                    len(batch),
                    int(b_docs),
                    int(b_tf),
                    float(wall),
                    float(b_docs / wall) if wall > 0 else 0.0,
                )
            ],
            "snapshot_id int, n_partitions int, n_docs long, sum_tf long, "
            "wall_s double, docs_per_sec double",
        ).write.mode("append").parquet(store.metrics_path)

        snap = Snapshot(
            snapshot_id=sid,
            parent_id=snap.snapshot_id if snap else None,
            committed_partitions=sorted(
                (set(snap.committed_partitions) if snap else set()) | set(batch)
            ),
            num_index_partitions=num_index_partitions,
            max_doc=(snap.max_doc if snap else 0) + idx.max_doc,
            sum_total_term_freq=(snap.sum_total_term_freq if snap else 0)
            + idx.sum_total_term_freq,
        )
        store.commit(snap)
        idx.unpersist()  # releases the persisted frames themselves (the docs
        # cache keeps the tokenized array column; unpersisting the projected
        # view would be a no-op and leak it across batches)
        batches_done += 1
        if fail_after_batches is not None and batches_done >= fail_after_batches:
            assigned.unpersist()
            raise SimulatedFailure(
                f"injected crash after {batches_done} batch(es); "
                f"committed={snap.committed_partitions}"
            )
    assigned.unpersist()
    return snap


def postings_from_compressed(compressed: DataFrame) -> DataFrame:
    """Decode the compressed segment rows back to exploded postings
    (index_partition, term, docid, tf, dl_approx) — the Catalyst scoring /
    facet source.  Arrow-batched decode, no per-row Python."""
    from lucene_solr_spark.index.codec import vb_decode
    from lucene_solr_spark.smallfloat import NORM_TABLE

    def decode(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                gaps = vb_decode(bytes(r["doc_gaps_vb"])).astype(np.int64)
                docids = np.cumsum(gaps)
                tfs = vb_decode(bytes(r["tfs_vb"])).astype(np.int32)
                norms = np.frombuffer(bytes(r["norm_bytes"]), dtype=np.uint8)
                out.append(
                    pd.DataFrame(
                        {
                            "index_partition": np.int32(r["index_partition"]),
                            "term": r["term"],
                            "docid": docids,
                            "tf": tfs,
                            "dl_approx": NORM_TABLE[norms].astype(np.float64),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return compressed.mapInPandas(
        decode,
        "index_partition int, term string, docid long, tf int, dl_approx double",
    )


def positions_from_compressed(compressed: DataFrame) -> DataFrame:
    """Decode compressed position rows back to the exploded positions view
    (index_partition, term, docid, pos, dl_approx) — the phrase / sloppy /
    span query source.  Arrow-batched decode, no per-row Python loops beyond
    the per-term blob walk."""
    from lucene_solr_spark.index.codec import decode_positions
    from lucene_solr_spark.smallfloat import NORM_TABLE

    def decode(batches):
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                docids, poss, norms = decode_positions(r)
                out.append(
                    pd.DataFrame(
                        {
                            "index_partition": np.int32(r["index_partition"]),
                            "term": r["term"],
                            "docid": docids,
                            "pos": poss.astype(np.int32),
                            "dl_approx": NORM_TABLE[norms].astype(np.float64),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return compressed.mapInPandas(
        decode,
        "index_partition int, term string, docid long, pos int, dl_approx double",
    )


def deleted_docids(spark: SparkSession, store: IndexStore, snap: Snapshot):
    """Union of all committed delete generations as (docid) — the liveDocs
    complement — or None when the store has no deletes."""
    if not snap.delete_gens:
        return None
    keep = F.col("dgen").isin(snap.delete_gens)
    return (
        spark.read.option("basePath", store.deletes_path)
        .parquet(store.deletes_path)
        .filter(keep)
        .select("docid")
        .distinct()
    )


def delete_docids(spark: SparkSession, root: str, docids: DataFrame) -> Snapshot:
    """Record a delete generation (IndexWriter.deleteDocuments /
    BufferedUpdates analog): write the docid set as deletes/dgen=<n> and
    commit a snapshot referencing it.  Applied at read time as an anti-join;
    collection stats are untouched until compaction, matching Lucene's
    liveDocs semantics."""
    store = IndexStore(root)
    snap = store.head()
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    dgen = max(snap.delete_gens or [0]) + 1
    docids.select(F.col("docid").cast("long").alias("docid")).distinct().write.mode(
        "overwrite"
    ).parquet(os.path.join(store.deletes_path, f"dgen={dgen}"))
    new_snap = Snapshot(
        **{
            **snap.__dict__,
            "snapshot_id": snap.snapshot_id + 1,
            "parent_id": snap.snapshot_id,
            "delete_gens": sorted(set(snap.delete_gens or []) | {dgen}),
        }
    )
    store.commit(new_snap)
    return new_snap


def open_index(
    spark: SparkSession, root: str, apply_deletes: bool = True
) -> IndexTables:
    """Open any store (batch partition-committed or streaming generational)
    at its current snapshot — dispatches on whether the snapshot tracks
    generations."""
    snap = IndexStore(root).head()
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    if snap.gens:
        from lucene_solr_spark.streaming.incremental import load_streaming_index

        return load_streaming_index(spark, root, apply_deletes=apply_deletes)
    return load_index(spark, root, apply_deletes=apply_deletes)


def delete_by_term(spark: SparkSession, root: str, term: str) -> Snapshot:
    """Solr deleteByQuery for a term: resolve matching docids against the
    committed postings, record them as a delete generation."""
    idx = open_index(spark, root, apply_deletes=False)
    matching = idx.postings.filter(F.col("term") == term).select("docid").distinct()
    return delete_docids(spark, root, matching)


def realtime_get(
    spark: SparkSession, root: str, keys: list, key_col: str = "url"
) -> DataFrame:
    """RealTimeGet (solr/core/.../component/RealTimeGetComponent.java):
    fetch documents by unique key across EVERY committed generation with
    delete generations applied — because each micro-batch soft-commits a
    snapshot, a reader that re-resolves HEAD sees a just-indexed doc
    immediately, and an updated doc resolves to its newest generation (the
    older version is in a delete bitmap)."""
    idx = open_index(spark, root)
    return idx.docs.filter(F.col(key_col).isin(list(keys)))


def delete_by_key(
    spark: SparkSession, root: str, keys: list, key_col: str = "url"
) -> Snapshot:
    """Delete-by-id (unique key), IndexWriter.deleteDocuments(Term(id))."""
    idx = open_index(spark, root, apply_deletes=False)
    matching = idx.docs.filter(F.col(key_col).isin(list(keys))).select("docid")
    return delete_docids(spark, root, matching)


def build_multifield_store(
    spark: SparkSession,
    source: DataFrame,
    root: str,
    key_col: str,
    field_exprs: dict,
    default_field: str,
    docid_col: str | None = None,
    num_index_partitions: int = 8,
    build_positions: bool = True,
):
    """Persist a multi-field schema (IndexSchema.java:79-149 — named fields,
    each with its own postings/norms/stats over a SHARED docid space): one
    field store per ``fields/<name>/`` directory plus an atomic
    ``schema.json`` manifest.  Idempotent per field: a field whose snapshot
    is already committed is skipped on re-run (same resumability contract as
    the partition-batched pages build)."""
    from lucene_solr_spark.index.fields import build_multifield_index

    # Resume check FIRST: a committed field is never re-built (the eager
    # per-field build_index pass is the expensive part), and only pending
    # fields' caches are ever created — so a fully-committed store is a
    # metadata-only no-op with nothing to leak.
    pending = {
        fname: expr
        for fname, expr in field_exprs.items()
        if IndexStore(os.path.join(root, "fields", fname)).head() is None
    }
    if pending:
        mfi = build_multifield_index(
            spark,
            source,
            key_col=key_col,
            field_exprs=pending,
            # temp default for the in-memory build only; the manifest below
            # records the caller's real default_field
            default_field=next(iter(pending)),
            docid_col=docid_col,
            num_index_partitions=num_index_partitions,
            persist=True,
            build_positions=build_positions,
        )
        for fname, idx in mfi.fields.items():
            try:
                froot = os.path.join(root, "fields", fname)
                store = IndexStore(froot)
                _write_partitioned(idx.docs, store.docs_path)
                _write_partitioned(
                    build_compressed_segments(idx, persist=False),
                    store.segments_path,
                )
                if idx.positions is not None:
                    _write_partitioned(
                        compress_positions(
                            idx.positions_grouped or idx.positions
                        ),
                        store.positions_path,
                    )
                store.commit(
                    Snapshot(
                        snapshot_id=1,
                        parent_id=None,
                        committed_partitions=list(range(num_index_partitions)),
                        num_index_partitions=num_index_partitions,
                        max_doc=idx.max_doc,
                        sum_total_term_freq=idx.sum_total_term_freq,
                    )
                )
            finally:
                idx.unpersist()
    manifest = {"fields": sorted(field_exprs), "default_field": default_field}
    tmp = os.path.join(root, "schema.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, "schema.json"))


def load_multifield_index(spark: SparkSession, root: str, apply_deletes: bool = True):
    """Open a persisted multi-field schema as a MultiFieldIndex (each field
    loads through load_index — decoded-postings view, positions layer,
    delete bitmaps all apply per field)."""
    from lucene_solr_spark.index.fields import MultiFieldIndex

    with open(os.path.join(root, "schema.json")) as f:
        manifest = json.load(f)
    fields = {
        fname: load_index(
            spark, os.path.join(root, "fields", fname), apply_deletes=apply_deletes
        )
        for fname in manifest["fields"]
    }
    return MultiFieldIndex(fields, manifest["default_field"])


def load_index(
    spark: SparkSession, root: str, apply_deletes: bool = True
) -> IndexTables:
    """Open the store at its current snapshot as queryable IndexTables.

    Collection stats come from the snapshot manifest (exact, build-order
    independent); postings are a lazy decoded view over the compressed
    segments, so the store holds exactly one copy of the posting data.

    Deletes: committed delete generations are applied as an anti-join on
    docs/postings; stats stay at their pre-delete values until compaction
    (Lucene liveDocs semantics).  A deleted store's WAND path re-encodes the
    live postings on first use (the zero-copy compressed view would leak
    deleted docs); compaction restores the zero-copy path."""
    store = IndexStore(root)
    snap = store.head()
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    keep = F.col("index_partition").isin(snap.committed_partitions)
    docs = spark.read.parquet(store.docs_path).filter(keep)
    compressed = spark.read.parquet(store.segments_path).filter(keep)
    postings = postings_from_compressed(compressed)
    segments = compressed.groupBy("term").agg(
        F.sum("df_part").cast("int").alias("df"),
        F.sum("cf_part").cast("long").alias("cf"),
    )
    positions = None
    if os.path.isdir(store.positions_path):
        positions = positions_from_compressed(
            spark.read.parquet(store.positions_path).filter(keep)
        )
    deleted = deleted_docids(spark, store, snap) if apply_deletes else None
    if deleted is not None:
        docs = docs.join(deleted, "docid", "left_anti")
        postings = postings.join(deleted, "docid", "left_anti")
        if positions is not None:
            positions = positions.join(deleted, "docid", "left_anti")
    index = IndexTables(
        docs=docs,
        postings=postings,
        segments=segments,
        max_doc=snap.max_doc,
        sum_total_term_freq=snap.sum_total_term_freq,
        avgdl=snap.avgdl,
        positions=positions,
    )
    if deleted is None:
        object.__setattr__(index, "_compressed", compressed)
    return index


def delete_by_query(
    spark: SparkSession, root: str, q: str, now_epoch_ms: int | None = None
) -> Snapshot:
    """Solr deleteByQuery with a full query string
    (DirectUpdateHandler2.deleteByQuery — the DBQ path): the body routes
    through the same parser/qparser machinery as an fq, so term / boolean /
    multi-term / {!type} bodies all resolve; matching docids become one
    delete generation.  Pure-negative bodies delete the complement
    (everything EXCEPT the matches), like a filter would select it."""
    from lucene_solr_spark.search.filtercache import _parse_filter

    idx = open_index(spark, root, apply_deletes=False)
    kind, df = _parse_filter(idx, q, now_epoch_ms=now_epoch_ms)
    if kind == "neg":
        matching = idx.docs.select("docid").join(df, "docid", "left_anti")
    else:
        matching = df.select("docid")
    return delete_docids(spark, root, matching.distinct())
