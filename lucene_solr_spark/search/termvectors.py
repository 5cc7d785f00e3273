"""TermVectorComponent: per-document term vectors.

Reference: solr/core/src/java/org/apache/solr/handler/component/
TermVectorComponent.java:83-400 — for each requested doc (``tv.docIds``) and
field, emit per-term info gated by the ``tv.*`` params: ``tv.tf`` (term
frequency, :157), ``tv.positions`` (:158,357-369), ``tv.df`` (docFreq from the
reader, :160,387-394), ``tv.tf_idf`` (freq/df — the reference's own "not
TF/IDF by anyone's definition" ratio, :396-400).

Spark shape: the per-doc slice is a docid filter over ``positions_grouped``
(one row per (docid, term) with tf + sorted position array — nothing is
re-tokenized), and df rides in from the term dictionary with the TINY per-doc
frame broadcast so the dictionary never shuffles.  At 100 TB the docid filter
prunes partitions (docid is the routing key) and the broadcast join touches
only matching dictionary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def term_vectors(
    index: IndexTables,
    docids: list[int],
    tf: bool = True,
    positions: bool = True,
    df: bool = True,
    tf_idf: bool = False,
) -> DataFrame:
    """Term vectors for ``docids`` -> one row per (docid, term), ordered
    (docid asc, term asc) — the component's per-doc, term-sorted emission.

    Columns follow the tv.* param gates: ``tf``, ``positions`` (int array),
    ``df``, ``tf_idf`` (tf/df as double)."""
    if not docids:
        raise ValueError("term_vectors needs >= 1 docid")
    if index.positions_grouped is not None:
        per_doc = index.positions_grouped.filter(
            F.col("docid").isin(list(docids))
        ).select("docid", "term", "tf", F.col("poss").alias("positions"))
    else:
        # postings carry tf; positions (if built) re-group on demand
        per_doc = index.postings.filter(F.col("docid").isin(list(docids))).select(
            "docid", "term", "tf"
        )
        if positions:
            if index.positions is None:
                raise ValueError("index built without positions")
            pos = (
                index.positions.filter(F.col("docid").isin(list(docids)))
                .groupBy("docid", "term")
                .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
            )
            per_doc = per_doc.join(pos, ["docid", "term"])
    cols = [F.col("docid"), F.col("term")]
    if tf:
        cols.append(F.col("tf").cast("long").alias("tf"))
    if positions:
        cols.append(F.col("positions"))
    if df or tf_idf:
        # broadcast the small per-doc frame; the dictionary streams map-side
        stats = index.term_stats().select("term", F.col("df").alias("_df"))
        per_doc = stats.join(F.broadcast(per_doc), "term")
        if df:
            cols.append(F.col("_df").cast("long").alias("df"))
        if tf_idf:
            # TermVectorComponent.java:396-400: tfIdfVal = (double) freq / df
            cols.append(
                (F.col("tf").cast("double") / F.col("_df")).alias("tf_idf")
            )
    return per_doc.select(*cols).orderBy("docid", "term")
