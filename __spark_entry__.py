"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship query on sf0.001; queries()/oracle_sql() expose the
operator registry from lucene_solr_spark.driver_queries — each Spark callable
paired with a DuckDB-runnable ANSI SQL oracle generated from the same semantic
sources (shared tokenizer regex, integer norm-quantization ranges, shared BM25
score formula text).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lucene_solr_spark.driver_queries import entry_query

    return entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucene_solr_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lucene_solr_spark.driver_queries import ORACLE

    return dict(ORACLE)
