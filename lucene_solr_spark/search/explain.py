"""DebugComponent explain: per-(doc, term) BM25 score decomposition.

Reference: ``debugQuery=true`` routes through DebugComponent
(solr/core/src/java/org/apache/solr/handler/component/DebugComponent.java:
82,130-160) to ``SolrIndexSearcher.explain`` -> Lucene's
``BM25Similarity.explainScore`` (lucene/core/src/java/org/apache/lucene/
search/similarities/BM25Similarity.java:296-330): score = product of ``idf``
(detail: docFreq, maxDocs) and ``tfNorm`` (details: freq, k1, b, avgFieldLength,
fieldLength).

This emits the same tree flattened to columns — one row per (docid, term):
``tf``/``df`` (the raw statistics), ``idf``, ``tf_norm``, and ``score``.
``score`` is computed from the engine's shared score-formula TEXT
(bm25.SCORE_TEMPLATE) so it is bit-identical to what ``search()`` ranks by;
``idf * tf_norm`` re-associates the same float64 factors, equal to ``score``
up to 1 ulp (the explain contract — Lucene's own Explanation values are
recomputed products too).

Scale shape: identical to term_scores — postings filtered to the query terms
(pushed to the scan), per-term stats broadcast; an optional docid filter
prunes further.  Everything is Catalyst expressions, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.bm25 import score_expr_sql


def explain_scores(
    index: IndexTables,
    terms: list[str],
    docids: list[int] | None = None,
) -> DataFrame:
    """Explanation rows for every posting of ``terms`` (optionally restricted
    to ``docids``): (docid, term, tf, df, idf, tf_norm, score), ordered
    (docid, term)."""
    if not terms:
        raise ValueError("explain needs >= 1 term")
    p = index.postings.filter(F.col("term").isin(list(terms)))
    if docids is not None:
        p = p.filter(F.col("docid").isin(list(docids)))
    stats = F.broadcast(
        index.term_stats().filter(F.col("term").isin(list(terms)))
    )
    n, avgdl = index.max_doc, index.avgdl
    idf = F.log(1.0 + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (
        F.lit(2.2)
        * F.col("tf")
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl_approx") / F.lit(avgdl)))
    )
    return (
        p.join(stats, "term")
        .select(
            "docid",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            idf.alias("idf"),
            tf_norm.alias("tf_norm"),
            F.expr(score_expr_sql(n, avgdl)).alias("score"),
        )
        .orderBy("docid", "term")
    )
