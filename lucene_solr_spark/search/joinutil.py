"""JoinUtil — query-time join with score propagation (lucene/join).

Reference semantics (public Apache Lucene 4.10.5 source, studied at
/root/reference/lucene/join/src/java/org/apache/lucene/search/join/
JoinUtil.java and TermsWithScoreCollector.java):

- The from-query's hits are collected per join value: every unique
  ``fromField`` term accumulates the scores of the from-docs carrying it —
  Total (sum), Max, Avg, or None (TermsWithScoreCollector.java:96-140).
- The to-side query matches docs whose ``toField`` term is in the collected
  set; each matching to-doc scores the aggregated value of its join term
  (TermsQuery + the collector's score array).

Engine mapping: the collector IS a groupBy(join value) aggregate over the
scored from-frame; the to-side is a join on the value.  Total/Avg fold the
per-value scores in ASCENDING VALUE order (sorted doubles commute exactly —
the canonical-order float discipline of to_parent_block_join), so both
engines agree bit-for-bit.

Scale shape: one hash aggregate on the join value (map-side combine), one
join against the to table (broadcastable when the from match set is
selective), no collect.  This is the flat-table generalization of the
engine's semi-join {!join} qparser — that path stays score-free like
Solr's JoinQParserPlugin; JoinUtil is the scored variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_util(
    scored_from: DataFrame,
    from_values: DataFrame,
    to_values: DataFrame,
    score_mode: str = "max",
    round_dp: int = 4,
) -> DataFrame:
    """(to docid, score) for JoinUtil.createJoin.

    ``scored_from``: (docid, score) — the from-query's scored hits.
    ``from_values``: (docid, joinval) — the from-side join field (exploded
    already if multi-valued).  ``to_values``: (docid, joinval) to-side.
    """
    j = scored_from.join(from_values, "docid").select("joinval", "score")
    g = j.groupBy("joinval").agg(
        F.max("score").alias("_mx"),
        F.array_sort(F.collect_list("score")).alias("_ss"),
    )
    total = F.aggregate("_ss", F.lit(0.0), lambda a, x: a + x)
    expr = {
        "max": F.col("_mx"),
        "total": total,
        "avg": total / F.size("_ss"),
        "none": F.lit(1.0),
    }[score_mode]
    vals = g.select("joinval", expr.alias("_vscore"))
    return (
        to_values.join(vals, "joinval")
        .select(
            "docid", F.round(F.col("_vscore"), round_dp).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("docid"))
    )
