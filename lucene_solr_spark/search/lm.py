"""Language-model similarities — LMDirichlet and LMJelinekMercer.

Math is SimilarityBase/LMSimilarity (/root/reference):

    p(t|C)          = (totalTermFreq + 1) / (numberOfFieldTokens + 1)
                      (LMSimilarity.java:153-154 DefaultCollectionModel)
    docLen          = NORM_TABLE[norm_byte] = 1/(f*f), f = byte315ToFloat
                      (SimilarityBase.java decodeNormValue — the index's
                      stored ``dl_approx`` column IS this value)
    coord, queryNorm = 1 (Similarity.java:122-124,139-141 — SimilarityBase
                      does not override; no TFIDF-style folds apply)

    LMDirichlet (LMDirichletSimilarity.java:65-69, default mu = 2000):
      s = boost * ( ln(1 + tf / (mu * p)) + ln(mu / (docLen + mu)) )
      score = s if s > 0 else 0          (negative scores clipped per term)

    LMJelinekMercer (LMJelinekMercerSimilarity.java:53-58):
      score = boost * ln(1 + ((1-lambda) * tf / docLen) / (lambda * p))

BooleanQuery sums per-term scores (no coord), MUST clauses filter, NOT
clauses anti-join — same frame shape as classic_topk / bm25._boolean_topk:
one term-pruned postings scan, one pivot hash-aggregate on docid,
fixed-order float64 addition of per-term contributions, round(score,
round_dp) BEFORE ordering, docid-ascending tie-break.

Determinism across engines: per-term p(t|C) is a float64 ratio of two
integers (cf, F) — the Spark path computes it driver-side from the term
dictionary (bounded collect: query terms only); the DuckDB oracle renders
the identical division from ``tstat``/``doclen`` CTEs
(oracle.sqlgen.lm_dirichlet_sql / lm_jm_sql); IEEE float64 division and the
shared ln agree.  Rank identity to the reference's float32 pipeline is
validated by the pure-Python float32 oracle in tests/test_lm.py.

Scale shape: identical to the BM25 path — postings term-pruned at the scan
(PushedFilters), term stats a bounded driver lookup, one hash aggregate,
TakeOrderedAndProject.  No new shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.bm25 import any_term_docset
from lucene_solr_spark.search.query import BooleanQuery


def collection_probability(cf: int, field_tokens: int) -> float:
    """LMSimilarity.DefaultCollectionModel.computeProbability
    (LMSimilarity.java:153-154) in float64."""
    return (cf + 1.0) / (field_tokens + 1.0)


def _lm_topk(
    index: IndexTables,
    q: BooleanQuery,
    contrib_for,
    k: int,
    round_dp: int,
) -> DataFrame:
    """Shared boolean-of-terms LM frame; ``contrib_for(i, term, p)`` returns
    the per-term score Column over the pivoted ``_tf{i}`` / ``dl_approx``."""
    must = [t.term for t in q.must]
    should = [t.term for t in q.should]
    terms = list(dict.fromkeys(must + should))
    if not terms:
        raise ValueError("LM boolean query needs at least one scoring clause")

    field_tokens = index.sum_total_term_freq
    cfs = {
        r.term: r.cf
        for r in index.term_stats().filter(F.col("term").isin(terms)).collect()
    }
    p = {t: collection_probability(cfs.get(t, 0), field_tokens) for t in terms}

    postings = index.postings.filter(F.col("term").isin(terms))
    aggs = [
        F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    aggs.append(F.first("dl_approx").alias("dl_approx"))
    per_doc = postings.groupBy("docid").agg(*aggs)

    total = F.lit(0.0)
    for i, t in enumerate(terms):
        total = total + F.coalesce(contrib_for(i, t, p[t]), F.lit(0.0))

    out = per_doc.withColumn("score", total)
    for i, t in enumerate(terms):
        if t in must:
            out = out.filter(F.col(f"_tf{i}").isNotNull())
    if should and q.minimum_should_match > 0:
        matched = sum(
            (F.col(f"_tf{terms.index(t)}").isNotNull()).cast("int") for t in should
        )
        out = out.filter(matched >= q.minimum_should_match)
    if q.must_not:
        excl = any_term_docset(index, [t.term for t in q.must_not])
        out = out.join(excl, "docid", "left_anti")
    return (
        out.select("docid", F.round("score", round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def lm_dirichlet_topk(
    index: IndexTables,
    q: BooleanQuery,
    mu: float = 2000.0,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k under LMDirichletSimilarity (LMDirichletSimilarity.java:65-69)."""
    boosts = {t.term: t.boost for t in (*q.must, *q.should)}

    def contrib(i: int, t: str, p: float):
        # s = boost * (ln(1 + tf/(mu*p)) + ln(mu/(docLen+mu)));
        # score = s if s > 0 else 0  (java :69) — same CASE text as the oracle
        s = F.lit(boosts.get(t, 1.0)) * (
            F.log(F.lit(1.0) + F.col(f"_tf{i}") / F.lit(mu * p))
            + F.log(F.lit(mu) / (F.col("dl_approx") + F.lit(mu)))
        )
        return F.when(F.col(f"_tf{i}").isNotNull(),
                      F.when(s > 0, s).otherwise(F.lit(0.0)))

    return _lm_topk(index, q, contrib, k, round_dp)


def lm_jelinek_mercer_topk(
    index: IndexTables,
    q: BooleanQuery,
    lam: float = 0.7,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k under LMJelinekMercerSimilarity
    (LMJelinekMercerSimilarity.java:53-58; Solr's default lambda 0.7)."""
    boosts = {t.term: t.boost for t in (*q.must, *q.should)}

    def contrib(i: int, t: str, p: float):
        return F.lit(boosts.get(t, 1.0)) * F.log(
            F.lit(1.0)
            + ((F.lit(1.0 - lam) * F.col(f"_tf{i}") / F.col("dl_approx"))
               / F.lit(lam * p))
        )

    return _lm_topk(index, q, contrib, k, round_dp)
