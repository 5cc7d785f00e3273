"""MemoryIndex reverse search — match a corpus against a REGISTERED QUERY SET.

The reference's lucene/memory module (public Apache Lucene 4.10.5 source,
studied at /root/reference/lucene/memory/src/java/org/apache/lucene/index/
memory/MemoryIndex.java) builds a single-document in-memory index so a
stream of documents can be matched against stored queries — the
percolator/alerting pattern ("prospective search", MemoryIndex.java class
javadoc).  Per document Lucene asks: which of my M queries match THIS doc?

Spark-first the loop inverts: ONE join between the corpus token set and the
exploded query-term table answers all M queries for all N docs at once —
the per-doc MemoryIndex disappears exactly like DWPT did (the engine
declares the result; Catalyst picks the physical loop).

Query table shape: (query_id, must array<string>, should array<string>,
mm int) with the engine's BooleanQuery match semantics: every MUST term
present, and — when SHOULD terms exist — at least ``max(mm, 1 if no MUST
else mm)`` of them.

Scale shape: the query table is the SMALL side (alerting sets are 10^3-10^6
rows vs a 10^12-doc stream) — it broadcasts; the corpus side is one
tokenize + explode-distinct projection; matching is a broadcast hash join +
one aggregate on (docid, query_id).  No shuffle of the corpus beyond the
aggregate; in Structured Streaming the same frame runs per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import tokens_expr


def match_queries(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(docid, query_id, n_matched): every (doc, registered query) match."""
    toks = (
        docs.select(
            F.col(id_col).alias("docid"),
            F.explode(
                F.coalesce(tokens_expr(F.col(text_col)), F.array())
            ).alias("term"),
        )
        .distinct()
    )
    qterms = queries.select(
        "query_id",
        F.size("must").alias("_nm"),
        F.size("should").alias("_ns"),
        F.col("mm"),
        F.explode(
            F.concat(
                F.transform("must", lambda t: F.struct(t.alias("term"), F.lit(1).alias("_req"))),
                F.transform("should", lambda t: F.struct(t.alias("term"), F.lit(0).alias("_req"))),
            )
        ).alias("_q"),
    ).select(
        "query_id", "_nm", "_ns", "mm",
        F.col("_q.term").alias("term"), F.col("_q._req").alias("_req"),
    )
    j = toks.join(F.broadcast(qterms), "term")
    g = j.groupBy("docid", "query_id", "_nm", "_ns", "mm").agg(
        F.sum("_req").alias("_mmatched"),
        F.sum(F.lit(1) - F.col("_req")).alias("_smatched"),
        F.count(F.lit(1)).alias("n_matched"),
    )
    must_ok = F.col("_mmatched") == F.col("_nm")
    # BooleanQuery semantics: shoulds gate only when mm > 0, or when there
    # is no MUST clause (then >= 1 should must hit)
    need = F.when(
        F.col("mm") > 0, F.col("mm")
    ).otherwise(F.when(F.col("_nm") == 0, F.lit(1)).otherwise(F.lit(0)))
    should_ok = (F.col("_ns") == 0) | (F.col("_smatched") >= need)
    return (
        g.where(must_ok & should_ok)
        .select("docid", "query_id", F.col("n_matched").cast("long").alias("n_matched"))
    )
