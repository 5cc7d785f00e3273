"""SweetSpotSimilarity — plateau length norm + baseline/hyperbolic tf.

Math is the reference's lucene/misc SweetSpotSimilarity (public Apache Lucene
4.10.5 source, studied at /root/reference/lucene/misc/src/java/org/apache/
lucene/misc/SweetSpotSimilarity.java; Solr factory:
solr/core/src/java/org/apache/solr/search/similarities/
SweetSpotSimilarityFactory.java):

    computeLengthNorm(x) = 1/sqrt( steepness * (|x-min| + |x-max| - (max-min)) + 1 )
                                                  (SweetSpotSimilarity.java:136-155)
    baselineTf(freq)     = 0 if freq == 0
                           else base            if freq <= min
                           else sqrt(freq + base^2 - min)
                                                  (SweetSpotSimilarity.java:169-186)
    hyperbolicTf(freq)   = min + (max-min)/2 * (tanh-like((freq-xoffset), base) + 1)
                                                  (SweetSpotSimilarity.java:188-225)

Everything else (idf, queryNorm, coord, the squared-idf scorer value) is
inherited from DefaultSimilarity — identical to search/classic.py.

Engine mapping.  SweetSpot's INDEX-TIME norm byte differs from the engine's
stored 1/sqrt(dl) byte, so the scorer recovers the exact token count
``num_terms`` from the docs table and re-quantizes through
``smallfloat.sweetspot_norm_ranges`` — an integer (dl_lo, dl_hi, decoded)
range table shared verbatim with the DuckDB oracle (a VALUES CTE), so the
float32 quantization crosses the engines as DATA, never as float logic.

Scale shape: identical to classic_topk plus one broadcast range join against
the <=256-row norm table and one docid join against docs for ``num_terms``
(both sides of that join are pruned: postings term-filtered at the scan, docs
column-pruned to (docid, num_terms)).  No new shuffle beyond the existing
pivot aggregate; top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.bm25 import any_term_docset
from lucene_solr_spark.search.classic import classic_query_stats
from lucene_solr_spark.search.query import BooleanQuery
from lucene_solr_spark.smallfloat import sweetspot_norm_ranges


def baseline_tf_col(tf: Column, tf_base: float = 0.0, tf_min: float = 0.0) -> Column:
    """baselineTf as a Catalyst column (freq > 0 guaranteed by postings).

    Rendered as ``CASE WHEN tf <= min THEN base ELSE sqrt(tf + (base^2 - min))``
    with the constant folded driver-side — the SQL oracle renders the same
    float64 text (oracle.sqlgen.sweetspot_bool_sql)."""
    c = tf_base * tf_base - tf_min
    return F.when(tf <= F.lit(tf_min), F.lit(tf_base)).otherwise(
        F.sqrt(tf + F.lit(c))
    )


def hyperbolic_tf_col(
    tf: Column,
    hyper_min: float = 0.0,
    hyper_max: float = 2.0,
    hyper_base: float = 1.3,
    hyper_xoffset: float = 10.0,
) -> Column:
    """hyperbolicTf as a Catalyst column (SweetSpotSimilarity.java:188-225):

        min + (max-min)/2 * ((b^x - b^-x)/(b^x + b^-x) + 1),  x = freq - xoffset
    """
    x = tf - F.lit(hyper_xoffset)
    up = F.pow(F.lit(hyper_base), x)
    dn = F.pow(F.lit(hyper_base), -x)
    return F.lit(hyper_min) + F.lit((hyper_max - hyper_min) / 2.0) * (
        (up - dn) / (up + dn) + F.lit(1.0)
    )


def sweetspot_norm_df(index: IndexTables, ln_min: int, ln_max: int, steepness: float):
    """Broadcast-able (dl_lo, dl_hi, ss_norm) frame from the shared range table."""
    rows = [
        (lo, hi, v) for lo, hi, v in sweetspot_norm_ranges(ln_min, ln_max, steepness)
    ]
    spark = index.docs.sparkSession
    return spark.createDataFrame(rows, "dl_lo long, dl_hi long, ss_norm double")


def sweetspot_topk(
    index: IndexTables,
    q: BooleanQuery,
    k: int = 10,
    ln_min: int = 1,
    ln_max: int = 1,
    steepness: float = 0.5,
    tf_mode: str = "baseline",
    tf_base: float = 0.0,
    tf_min: float = 0.0,
    hyper_min: float = 0.0,
    hyper_max: float = 2.0,
    hyper_base: float = 1.3,
    hyper_xoffset: float = 10.0,
    round_dp: int = 4,
    disable_coord: bool = False,
) -> DataFrame:
    """Top-k under SweetSpotSimilarity for a boolean query of term clauses.

    Same frame shape as classic_topk: one term-pruned postings scan, one
    pivot aggregate, docid join for exact num_terms, broadcast range join
    for the quantized plateau norm, fixed-order float64 score fold,
    TakeOrderedAndProject.
    """
    must = [t.term for t in q.must]
    should = [t.term for t in q.should]
    boosts = {t.term: t.boost for t in (*q.must, *q.should)}
    terms = list(dict.fromkeys(must + should))
    if not terms:
        raise ValueError("sweetspot boolean query needs at least one scoring clause")

    n = index.max_doc
    dfs = {
        r.term: r.df
        for r in index.term_stats().filter(F.col("term").isin(terms)).collect()
    }
    # idf / queryNorm / squared-idf scorer value inherited from DefaultSimilarity
    idf, qn = classic_query_stats(n, terms, dfs, boosts)

    p = index.postings.filter(F.col("term").isin(terms))
    aggs = [
        F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = p.groupBy("docid").agg(*aggs)
    per_doc = per_doc.join(
        index.docs.select("docid", "num_terms"), "docid", "inner"
    )
    norms = sweetspot_norm_df(index, ln_min, ln_max, steepness)
    per_doc = per_doc.join(
        F.broadcast(norms),
        (F.col("num_terms") >= F.col("dl_lo")) & (F.col("num_terms") <= F.col("dl_hi")),
    )

    def tf_fn(col: Column) -> Column:
        if tf_mode == "baseline":
            return baseline_tf_col(col, tf_base, tf_min)
        if tf_mode == "hyperbolic":
            return hyperbolic_tf_col(col, hyper_min, hyper_max, hyper_base, hyper_xoffset)
        raise ValueError(f"unknown tf_mode {tf_mode!r}")

    total = F.lit(0.0)
    overlap = F.lit(0)
    for i, t in enumerate(terms):
        value = (idf[t] * boosts.get(t, 1.0) * qn) * idf[t]
        contrib = F.coalesce(
            tf_fn(F.col(f"_tf{i}")) * F.lit(value) * F.col("ss_norm"),
            F.lit(0.0),
        )
        total = total + contrib
        overlap = overlap + F.col(f"_tf{i}").isNotNull().cast("int")

    max_overlap = len(q.must) + len(q.should)
    if disable_coord or max_overlap <= 1:
        score = total
    else:
        score = total * (overlap * F.lit(1.0) / F.lit(max_overlap))

    out = per_doc.withColumn("score", score)
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
