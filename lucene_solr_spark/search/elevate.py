"""QueryElevation: editorially pin documents to the top of a result page.

Reference: ``solr/core/src/java/org/apache/solr/handler/component/
QueryElevationComponent.java:108-230`` — per query string, a configured
``ElevationObj`` holds elevated ids (returned FIRST, in configured order,
regardless of score — the component's ``ElevationComparatorSource`` sorts a
"priority" field before the score sort) and excluded ids (removed from the
page).  With ``forceElevation`` (``:123``) elevated docs appear even when
the query would not have matched them; we implement that mode — it is the
common editorial use and subsumes the other.

Spark-first shape: the elevation map is a HANDFUL of (docid, ord) rows — a
driver-local literal frame; the base page is the engine's own top-k (already
bounded).  Compose = anti-join out elevated/excluded ids, stack the two
bounded frames, rank with a single ``row_number`` over a frame of at most
``k + len(elevated)`` rows — bounded by construction, so the unpartitioned
window is NOT a scale hazard (contrast the keyset cursor for deep paging).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.bm25 import search


def elevate_topk(
    index: IndexTables,
    query,
    elevated_ids: list[int],
    excluded_ids: list[int] = (),
    k: int = 10,
) -> DataFrame:
    """Top-k page with elevation -> (position, docid, elevated, score).

    Elevated docs occupy positions 1..len(elevated) in configured order,
    carrying their organic score when they rank inside the retrieved
    k+len(elevated)+len(excluded) window and 0.0 otherwise (the component
    reports elevated entries outside the collected page without a score);
    the rest of the page is the organic ranking minus elevated/excluded ids.
    """
    spark = index.docs.sparkSession
    drop = [int(d) for d in (*elevated_ids, *excluded_ids)]
    organic = search(index, query, k=k + len(drop))
    base = (
        organic.filter(~F.col("docid").isin(drop))
        .limit(max(k - len(elevated_ids), 0))
    )
    elev = spark.createDataFrame(
        [(int(d), i + 1) for i, d in enumerate(elevated_ids)],
        "docid long, _ord int",
    )
    elev_scored = (
        elev.join(organic.withColumnRenamed("score", "_oscore"), "docid", "left")
        .select(
            "docid",
            F.lit(True).alias("elevated"),
            F.coalesce(F.col("_oscore"), F.lit(0.0)).alias("score"),
            F.col("_ord"),
        )
    )
    rest = base.select(
        "docid", F.lit(False).alias("elevated"), "score",
        F.lit(None).cast("int").alias("_ord"),
    )
    w = Window.orderBy(
        F.col("elevated").desc(),
        F.col("_ord").asc_nulls_last(),
        F.col("score").desc(),
        F.col("docid").asc(),
    )
    return (
        elev_scored.unionByName(rest)
        .withColumn("position", F.row_number().over(w))
        .select("position", "docid", "elevated", "score")
        .orderBy("position")
        .limit(k)
    )
