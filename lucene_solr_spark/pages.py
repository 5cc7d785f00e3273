"""The north-rule input table: Common-Crawl-style ``pages`` and its pipeline.

Input shape (authoritative, BASELINE.json input_hint):
    pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

This module provides:

- ``pages_from_documents`` — deterministic synthesis of a pages table from the
  driver testdata ``documents`` table (seeded by doc_id; parallelism-invariant;
  all JVM-side expressions) so tests/benchmarks run over the exact input shape
  without external data.
- ``extract_text_expr`` — the HTMLStripCharFilter analog
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
  HTMLStripCharFilter.java:38 — tag/entity stripping pre-tokenization) for the
  synthetic wrapper markup, as a JVM-side regex (identical under RE2 for the
  DuckDB oracle).  The per-row invariant ("byte-identical extracted text per
  url") is enforced by ``verify_extraction``.
- ``build_index_from_pages`` — end-to-end: html -> text -> analyzer -> index,
  with content-deterministic docids derived from ``url`` using a
  cross-engine-portable hash (md5 prefix), mirroring Solr's content-hash doc
  routing (solr/solrj/.../CompositeIdRouter.java:46-55) while staying exactly
  reproducible inside the SQL oracle.  At cluster scale swap the md5 for
  xxhash64 — the plumbing is identical; md5 keeps the correctness gate
  cross-engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import DOCID_PARTITION_SHIFT, IndexTables, build_index

WARC_EPOCH = 1704067200  # 2024-01-01T00:00:00Z, deterministic timestamp base

# (?s): text spans newlines. Same pattern semantics in Java regex and RE2.
BODY_PATTERN = "(?s)<p>(.*)</p>"


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pages table derived from documents.parquet.

    url      — https://site{doc_id % 100}.example/doc/{doc_id} (100 hosts)
    warc_ts  — WARC_EPOCH + doc_id seconds
    html     — UTF-8 bytes of a wrapper document embedding ``text``
    text     — byte-identical to documents.text (the extraction invariant)
    lang     — passthrough
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.lit("https://site"), (F.col("doc_id") % 100).cast("string"),
        F.lit(".example/doc/"), F.col("doc_id").cast("string"),
    )
    html_str = F.concat(
        F.lit("<html><head><title>doc "), F.col("doc_id").cast("string"),
        F.lit("</title></head><body><p>"), F.col("text"), F.lit("</p></body></html>"),
    )
    return d.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(WARC_EPOCH) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def extract_text_expr(html: Column) -> Column:
    """html binary -> extracted text string (HTMLStripCharFilter analog)."""
    return F.regexp_extract(F.decode(html, "UTF-8"), BODY_PATTERN, 1)


def verify_extraction(pages: DataFrame) -> int:
    """Number of rows violating the per-row invariant (0 on a healthy table):
    extracted text must be byte-identical to the ``text`` column per url."""
    return (
        pages.select(
            (extract_text_expr(F.col("html")) == F.col("text")).alias("ok")
        )
        .where(~F.col("ok") | F.col("ok").isNull())
        .count()
    )


def portable_url_hash(url: Column) -> Column:
    """60-bit non-negative hash of url, identical in Spark and DuckDB
    (hashing.hash64_col).  Cluster deploys may swap in xxhash64; md5 keeps
    the DuckDB correctness oracle byte-exact."""
    from lucene_solr_spark.hashing import hash64_col

    return hash64_col(url)


def assign_page_docids(pages: DataFrame, num_index_partitions: int) -> DataFrame:
    """Content-deterministic, parallelism-invariant docid assignment:
    partition = md5-hash(url) % P, local = rank of url within partition,
    docid = partition << 32 | local."""
    pid = (portable_url_hash(F.col("url")) % num_index_partitions).cast("int")
    w = Window.partitionBy("index_partition").orderBy("url")
    return (
        pages.withColumn("index_partition", pid)
        .withColumn(
            "docid",
            (
                F.col("index_partition").cast("long")
                * F.lit(1 << DOCID_PARTITION_SHIFT)
                + (F.row_number().over(w) - 1)
            ).cast("long"),
        )
    )


def build_index_from_pages(
    spark: SparkSession,
    pages: DataFrame,
    num_index_partitions: int = 8,
    build_positions: bool = False,
) -> IndexTables:
    """End-to-end pages pipeline: extract text from html (validated against
    the invariant by callers via verify_extraction), assign url-derived
    docids, build the index over the EXTRACTED text."""
    src = (
        assign_page_docids(pages, num_index_partitions)
        .withColumn("extracted", extract_text_expr(F.col("html")))
        .select("docid", "url", "extracted", "lang", "index_partition")
    )
    return build_index(
        spark,
        src,
        key_col="url",
        text_col="extracted",
        docid_col="docid",
        num_index_partitions=num_index_partitions,
        passthrough_cols=("lang",),
        build_positions=build_positions,
    )


def pages_docmap_sql(num_index_partitions: int = 8) -> str:
    """DuckDB SQL producing (docid, text) with the SAME docid assignment as
    assign_page_docids, for prelude_sql() — the oracle replays the whole
    pages pipeline from the documents view."""
    return f"""SELECT pid * 4294967296 + (row_number() OVER (PARTITION BY pid ORDER BY url) - 1) AS docid,
       text
FROM (
  SELECT url, text,
         CAST(('0x' || substr(md5(url), 1, 15)) AS BIGINT) % {num_index_partitions} AS pid
  FROM (
    SELECT 'https://site' || CAST(doc_id % 100 AS VARCHAR) || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
           text
    FROM documents
  )
)"""
