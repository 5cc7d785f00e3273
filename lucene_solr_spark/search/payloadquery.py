"""PayloadTermQuery — span term scoring shaped by per-occurrence payloads.

Semantics are the reference's lucene/core payload queries (public Apache
Lucene 4.10.5 source, studied at /root/reference/lucene/core/src/java/org/
apache/lucene/search/payloads/):

- ``PayloadTermQuery`` (PayloadTermQuery.java:60-175): a SpanTermQuery whose
  score is ``spanScore * payloadScore`` (includeSpanScore=true, :146-150) or
  the payload score alone.  Occurrences WITHOUT a payload are skipped by the
  ``isPayloadAvailable()`` gate (:124-145) — they count toward the span freq
  but not toward payloadsSeen.
- Payload functions (AveragePayloadFunction/MinPayloadFunction/
  MaxPayloadFunction.java): avg = sum/seen, min/max = running fold; all
  three return 1 when no payloads were seen (docScore :36-39).
- The payload factor is ``similarity.scorePayload``; the 4.10 default
  returns 1, so the conventional production setup overrides it to
  ``PayloadHelper.decodeFloat`` — that float-decode convention is what this
  scorer implements (payloads enter as their decoded float32 values).

Span score: the engine's span discipline maps a term span to sloppyFreq 1
per occurrence (the repo-wide convention of span_or_topk/bm25.py — the
slack form of matchLength), so the span freq equals tf and the span score
is the shared BM25 formula text over (tf, df, dl_approx) of the payload
field.

Scale shape: one term-pruned scan of the payload postings (PushedFilters
EqualTo(term)), per-row higher-order array folds for the payload function
(JVM-side, no shuffle), TakeOrderedAndProject top-k.  Collection stats are
two bounded scalars (df of the query term, max_doc/avgdl from the build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.payloads import PayloadIndex
from lucene_solr_spark.search.bm25 import score_formula


def payload_fold(payloads_col: str, function: str):
    """docScore fold over the payloads array: avg/min/max, 1.0 when empty."""
    c = F.col(payloads_col)
    n = F.size(c)
    if function == "avg":
        fold = F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x) / n
    elif function == "min":
        fold = F.array_min(c)
    elif function == "max":
        fold = F.array_max(c)
    else:
        raise ValueError(f"unknown payload function {function!r}")
    return F.when(n > 0, fold).otherwise(F.lit(1.0))


def payload_term_topk(
    pindex: PayloadIndex,
    term: str,
    function: str = "avg",
    include_span_score: bool = True,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k for PayloadTermQuery(term, function, includeSpanScore)."""
    p = pindex.postings.filter(F.col("term") == term)
    pay = payload_fold("payloads", function)
    if include_span_score:
        df = pindex.term_df(term)
        span = F.expr(
            score_formula(
                tf="tf", df=str(df), dl="dl_approx",
                n=str(pindex.max_doc), avgdl=repr(float(pindex.avgdl)),
            )
        )
        score = span * pay
    else:
        score = pay
    return (
        p.select("docid", F.round(score, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
