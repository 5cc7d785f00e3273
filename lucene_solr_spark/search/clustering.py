"""Search-result clustering — the ClusteringComponent surface.

Reference: solr/contrib/clustering/src/java/org/apache/solr/handler/
clustering/ClusteringComponent.java:58-220 (a SearchComponent that runs a
ClusteringEngine over the current result window and attaches named clusters
of documents to the response) and SearchClusteringEngine.java (the engine
contract: docs + query -> clusters with labels).  The shipped engines are
Carrot2 algorithms (Lingo/STC — heavyweight matrix/suffix machinery, out of
scope); this module implements the component contract with a deterministic
dominant-term engine:

  - run the query, take the top ``rows`` docs (the reference clusters the
    RESULT WINDOW, not the corpus — ClusteringComponent.java:170-190)
  - label each doc with its highest tf*idf NON-QUERY term (the
    "interesting term" gate MoreLikeThis uses, MoreLikeThis.java:630-660;
    Carrot2 likewise suppresses query terms in labels), ties term-asc
  - clusters = group by label: (label, size, docids asc), ordered
    size desc / label asc

Every step is DataFrame-shaped: the scored window is k-bounded, the label
argmax is one window function over (window x doc-terms) rows term-pruned by
the docid semi-join, the grouping is a hash aggregate.  No driver loops.

Determinism: idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the module's shared
MLT gate formula; tf*idf ties break term-ascending; cluster order is
(size desc, label asc); docids within a cluster ascend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def cluster_results(
    index: IndexTables,
    query_terms: list[str],
    rows: int = 30,
    min_cluster_size: int = 1,
) -> DataFrame:
    """Cluster the top-``rows`` BM25 results of an OR query over
    ``query_terms``.  Returns (label, size, docids) ordered by
    (size desc, label asc)."""
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    window = search(
        index, BooleanQuery.of(should=query_terms), k=rows
    ).select("docid")

    n = index.max_doc
    # per-doc dominant non-query term by tf*idf (MLT interesting-terms gate).
    # Broadcast discipline: the window's postings are the BOUNDED side (k docs
    # x their terms); term_stats is the unbounded |V|-row dictionary.  Prune
    # the dictionary by the window's term set (broadcast semi-join — the tiny
    # term list ships, the dictionary only scans) before the stats broadcast,
    # the same pattern term_scores uses (bm25.py:72).  Never broadcast |V|.
    doc_terms = (
        index.postings.join(window, "docid")
        .filter(~F.col("term").isin(query_terms))
    )
    pruned_stats = index.term_stats().select("term", "df").join(
        F.broadcast(doc_terms.select("term").distinct()), "term", "left_semi"
    )
    cand = (
        doc_terms
        .join(F.broadcast(pruned_stats), "term")
        .select(
            "docid", "term",
            (
                F.col("tf")
                * F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
            ).alias("w"),
        )
    )
    pick = Window.partitionBy("docid").orderBy(F.desc("w"), F.asc("term"))
    labeled = (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("docid", F.col("term").alias("label"))
    )
    # docids as a comma-joined string, not array<long>: flat scalar columns
    # survive every downstream canonicalizer (the driver's pandas-based
    # result compare cannot hash array cells), and the string is the same
    # deterministic (sorted-ascending) encoding on both engines.
    return (
        labeled.groupBy("label")
        .agg(
            F.count("*").alias("size"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("docid")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("docids"),
        )
        .filter(F.col("size") >= min_cluster_size)
        .orderBy(F.desc("size"), F.asc("label"))
    )
