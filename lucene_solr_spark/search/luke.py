"""LukeRequestHandler analog — /admin/luke index introspection.

Reference semantics (public Apache Solr 4.10 source, studied at
/root/reference/solr/core/src/java/org/apache/solr/handler/admin/
LukeRequestHandler.java):

- ``topTerms`` (:595-634): walk the field's TermsEnum collecting the top
  ``numTerms`` terms by docFreq in a bounded priority queue.
- df histogram (:613-615, TermHistogram :677-698): every distinct term lands
  in slot ``32 - numberOfLeadingZeros(max(0, df-1))`` — i.e. the integer
  bit length of ``df - 1`` (df=1 -> slot 0) — and the response labels each
  slot ``2^slot``.
- index info (:280-330): numDocs / maxDoc / numTerms (distinct terms) and
  per-field ``distinct`` counts.

Engine mapping: the term dictionary IS the walk — ``topTerms`` is an
ORDER BY df DESC LIMIT k over term_stats (TakeOrderedAndProject), the
histogram is one hash aggregate over an integer bit-length expression
(``conv(df-1, 10, 2)`` string length — pure integer logic shared verbatim
with the DuckDB oracle's ``length(bin(df-1))``), and the summary row is a
single bounded aggregate.  No collect beyond the k/bucket-bounded results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def luke_top_terms(index: IndexTables, k: int = 10) -> DataFrame:
    """topTerms: (term, df) by descending docFreq, term-ascending ties."""
    return (
        index.term_stats()
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def _slot_col() -> Column:
    """TermHistogram slot: bit length of (df - 1); 0 for df == 1.

    ``conv`` renders the binary string without leading zeros, so its length
    is the bit length — integer logic end to end, no float log2."""
    return (
        F.when(F.col("df") <= 1, F.lit(0))
        .otherwise(F.length(F.conv((F.col("df") - 1).cast("string"), 10, 2)))
    )


def luke_histogram(index: IndexTables) -> DataFrame:
    """(bucket, n_terms): distinct-term count per power-of-two df bucket,
    labeled 2^slot like TermHistogram.toNamedList (:690-696)."""
    return (
        index.term_stats()
        .select(
            F.call_function("shiftleft", F.lit(1), _slot_col())
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .orderBy("bucket")
    )


def luke_index_summary(index: IndexTables) -> DataFrame:
    """One row: num_docs, distinct_terms, total_term_freq (the index-info
    block re-expressed over the term dictionary)."""
    return index.term_stats().agg(
        F.lit(int(index.max_doc)).cast("long").alias("num_docs"),
        F.count(F.lit(1)).alias("distinct_terms"),
        F.sum("cf").cast("long").alias("total_term_freq"),
    )
