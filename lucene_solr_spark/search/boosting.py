"""BoostingQuery and CustomScoreQuery — lucene/queries score-shaping wrappers.

Reference semantics (public Apache Lucene 4.10.5 source, studied at
/root/reference/lucene/queries/src/java/org/apache/lucene/queries/):

- ``BoostingQuery`` (BoostingQuery.java:40-85): ``match`` selects and scores
  documents; ``context`` (boost set to 0 so it never contributes score, and
  SHOULD so it never gates matching) demotes/promotes — the overridden coord
  returns 1.0 when only ``match`` hit and ``boost`` when both did, so a
  context hit multiplies the match score by ``boost`` (typically < 1).
- ``CustomScoreQuery`` (CustomScoreQuery.java + CustomScoreProvider.java:
  74-112): ModifiedScore = subQueryScore * product(valSrcScores) — the
  subquery's score reshaped by one or more function-query value sources
  (the default provider; subclass hooks are out of scope).

Engine mapping: the match/sub query runs through the engine's BM25 boolean
frame (bm25._boolean_topk, coord-free like BM25); the context set is an
``any_term_docset`` semi-join flag; value sources compile through the
function-query registry (functions/value_sources.parse_function_query) and
evaluate over the docs columns joined back by docid.

Determinism discipline: the match stage rounds to the module's standard
4 dp (the engine-wide round-before-order contract), then the wrapper
multiplies and re-rounds — the SQL oracles render the identical two-stage
text, so both engines agree bit-for-bit.

Scale shape: the match frame is the usual term-pruned scan + pivot; the
context flag is a semi-join against a distinct-docid set (broadcastable for
selective contexts); value-source columns are pure codegen over the joined
docs projection.  No driver materialization, top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.bm25 import _boolean_topk, any_term_docset
from lucene_solr_spark.search.query import BooleanQuery


def boosting_query_topk(
    index: IndexTables,
    match: BooleanQuery,
    context_terms: list[str],
    boost: float,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k for BoostingQuery(match, context, boost)."""
    m = _boolean_topk(index, match, k, round_dp)
    ctx = any_term_docset(index, list(context_terms)).withColumn(
        "_inctx", F.lit(1)
    )
    out = m.join(ctx, "docid", "left").withColumn(
        "score",
        F.round(
            F.col("score")
            * F.when(F.col("_inctx").isNotNull(), F.lit(float(boost))).otherwise(
                F.lit(1.0)
            ),
            round_dp,
        ),
    )
    return (
        out.select("docid", "score")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def custom_score_topk(
    index: IndexTables,
    docs: DataFrame,
    sub: BooleanQuery,
    value_sources: list[str],
    k: int = 10,
    round_dp: int = 4,
    now_epoch_ms: int | None = None,
) -> DataFrame:
    """Top-k for CustomScoreQuery(sub, FunctionQuery(vs)...) under the
    default provider: subQueryScore * product of value-source scores.

    ``docs`` supplies the columns the value sources read, keyed by a
    ``docid`` column (join is docid-to-docid, column-pruned to what the
    functions reference).
    """
    from lucene_solr_spark.functions.value_sources import parse_function_query

    m = _boolean_topk(index, sub, k, round_dp)
    joined = m.join(docs, "docid", "inner")
    score = F.col("score")
    for vs in value_sources:
        score = score * parse_function_query(
            vs, now_epoch_ms=now_epoch_ms, index=index
        )
    out = joined.withColumn("score", F.round(score, round_dp))
    return (
        out.select("docid", "score")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
