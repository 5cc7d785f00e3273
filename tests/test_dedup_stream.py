"""Streaming cross-batch exact dedup (applyInPandasWithState).

Cross-batch state: the same content hash arriving in a LATER micro-batch
must be dropped — per-request dedup (SignatureUpdateProcessorFactory) can't
do that; the arbitrary-stateful-operator form can.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.streaming.dedup_stream import dedup_stream

DDL = "url string, text string"


def _run_stream(spark, tmp_path, batches):
    """Write each batch as one parquet file, stream with one file per
    trigger so batches process in order, collect the memory sink."""
    inp = str(tmp_path / "in")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(
            f"{inp}/b{i}"
        )
    stream = (
        spark.readStream.schema(DDL).format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(f"{inp}/*")
    )
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    return spark.sql("SELECT * FROM dedup_sink").collect()


def test_cross_batch_dedup(spark, tmp_path):
    rows = _run_stream(
        spark,
        tmp_path,
        [
            [("u/1", "alpha body"), ("u/2", "beta body")],
            [("u/3", "alpha body"), ("u/4", "gamma body")],  # u/3 is a recrawl
            [("u/5", "beta body"), ("u/6", "alpha body")],   # both recrawls
        ],
    )
    got = sorted((r.url, r.text) for r in rows)
    assert got == [
        ("u/1", "alpha body"), ("u/2", "beta body"), ("u/4", "gamma body")
    ]


def test_within_batch_smallest_url_wins(spark, tmp_path):
    rows = _run_stream(
        spark, tmp_path,
        [[("u/9", "dup body"), ("u/2", "dup body"), ("u/5", "dup body")]],
    )
    assert [(r.url, r.text) for r in rows] == [("u/2", "dup body")]


def test_matches_batch_exact_dedup(spark, tmp_path):
    """The stream's survivor set == the batch exact-dedup canonical set over
    the union of all batches (url standing in for doc_id ordering)."""
    batches = [
        [("u/01", "a"), ("u/02", "b")],
        [("u/03", "a"), ("u/04", "c"), ("u/05", "b")],
        [("u/06", "d")],
    ]
    rows = _run_stream(spark, tmp_path, batches)
    stream_survivors = sorted(r.url for r in rows)

    allrows = [r for b in batches for r in b]
    df = spark.createDataFrame(allrows, DDL)
    batch_survivors = sorted(
        r.url
        for r in df.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("url").alias("url"))
        .collect()
    )
    assert stream_survivors == batch_survivors
