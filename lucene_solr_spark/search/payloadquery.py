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


def payload_near_topk(
    pindex: PayloadIndex,
    terms: list[str],
    slop: int = 0,
    function: str = "avg",
    include_span_score: bool = True,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """PayloadNearQuery (PayloadNearQuery.java:48-180 PayloadNearSpanScorer):
    an ordered two-term span-near whose score is shaped by the payloads of
    EVERY subspan inside each matched span — per span, both terms' payloads
    feed the running function (processPayloads :150-170); the doc score is
    ``spanScore * docScore(payloadsSeen, payloadScore)`` like the term
    variant.

    Engine mapping: the anchor form of the ordered chain (first term's
    position + the NEXT occurrence of the second term, matchLength = gap
    slack — the repo-wide span convention), payload collection as one
    flatten + null-filter over the span frame, avg folded over the
    ASCENDING-sorted payload values (canonical float order).  Scale shape:
    positions term-pruned at the scan, one join + one hash aggregate.
    """
    if pindex.positions is None:
        raise ValueError("payload index built without positions")
    if len(terms) != 2:
        raise ValueError("payload_near supports the two-term ordered chain")
    t0, t1 = terms
    pos = pindex.positions
    a = pos.filter(F.col("term") == t0).select(
        "docid", "dl_approx",
        F.col("pos").alias("_p0"), F.col("payload").alias("_pay0"),
    )
    b = pos.filter(F.col("term") == t1).select(
        F.col("docid").alias("_d"),
        F.col("pos").alias("_e"), F.col("payload").alias("_pay1"),
    )
    j = a.join(b, (a["docid"] == b["_d"]) & (F.col("_e") > F.col("_p0")))
    # NearSpansOrdered greedy minimal continuation: the FIRST t1 past p0;
    # struct-min carries that occurrence's payload along
    spans = (
        j.groupBy("docid", "dl_approx", "_p0", "_pay0")
        .agg(F.min(F.struct(F.col("_e"), F.col("_pay1"))).alias("_m"))
        .select(
            "docid", "dl_approx", "_p0", "_pay0",
            F.col("_m._e").alias("_e"), F.col("_m._pay1").alias("_pay1"),
        )
        .withColumn("_ml", F.col("_e") - F.col("_p0") - 1)
        .where(F.col("_ml") <= slop)
    )
    aggs = [
        F.sum((F.col("_ml") == m).cast("long")).alias(f"_c{m}")
        for m in range(slop + 1)
    ]
    aggs.append(
        F.array_sort(
            F.flatten(F.collect_list(F.array(F.col("_pay0"), F.col("_pay1"))))
        ).alias("_praw")
    )
    g = spans.groupBy("docid", "dl_approx").agg(*aggs)
    tf = F.lit(0.0)
    for m in range(slop + 1):
        tf = tf + F.col(f"_c{m}") * F.lit(1.0 / (1 + m))
    pays = F.filter(F.col("_praw"), lambda x: x.isNotNull())
    n_pay = F.size(pays)
    if function == "avg":
        fold = F.aggregate(pays, F.lit(0.0), lambda acc, x: acc + x) / n_pay
    elif function == "min":
        fold = F.array_min(pays)
    elif function == "max":
        fold = F.array_max(pays)
    else:
        raise ValueError(f"unknown payload function {function!r}")
    pay_score = F.when(n_pay > 0, fold).otherwise(F.lit(1.0))
    g = g.withColumn("_tf", tf).where(F.col("_tf") > 0)
    if include_span_score:
        import math

        dfs = {
            r.term: r.df
            for r in pindex.postings.filter(F.col("term").isin([t0, t1]))
            .groupBy("term")
            .agg(F.countDistinct("docid").alias("df"))
            .collect()
        }
        n = pindex.max_doc
        idf = sum(
            math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
            for t in (t0, t1)
        )
        span = (
            F.lit(idf) * F.lit(2.2) * F.col("_tf")
            / (
                F.col("_tf")
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75) * F.col("dl_approx") / F.lit(float(pindex.avgdl))
                )
            )
        )
        score = span * pay_score
    else:
        score = pay_score
    return (
        g.select("docid", F.round(score, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def span_payload_check_topk(
    pindex: PayloadIndex,
    term: str,
    payload_to_match: list[float],
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """SpanPayloadCheckQuery (lucene/core search/spans/SpanPayloadCheckQuery
    .java:45-75): keep only the match spans whose payload SEQUENCE equals
    ``payload_to_match`` — a term span carries at most one payload, so the
    check is size==1 plus equality; spans with NO payload are accepted
    unconditionally (acceptPosition returns YES when isPayloadAvailable is
    false).  SpanNear matches are rejected by the reference constructor and
    here too (use payload_near_topk's function fold for near semantics).

    Scoring: the accepted occurrences form the span freq under the repo's
    term-span sloppyFreq-1 convention, BM25 over the payload field's stats.
    """
    if pindex.positions is None:
        raise ValueError("payload index built without positions")
    import math

    pos = pindex.positions.filter(F.col("term") == term)
    if len(payload_to_match) == 1:
        accept = F.col("payload").isNull() | (
            F.col("payload") == F.lit(float(payload_to_match[0]))
        )
    else:
        # a term span can never carry a multi-payload sequence: only the
        # payload-less occurrences pass the size check's failure branch
        accept = F.col("payload").isNull()
    g = (
        pos.where(accept)
        .groupBy("docid", "dl_approx")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )
    df_t = pindex.term_df(term)
    n = pindex.max_doc
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
    score = (
        F.lit(idf) * F.lit(2.2) * F.col("_tf")
        / (
            F.col("_tf")
            + F.lit(1.2)
            * (
                F.lit(0.25)
                + F.lit(0.75) * F.col("dl_approx") / F.lit(float(pindex.avgdl))
            )
        )
    )
    return (
        g.select("docid", F.round(score, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
