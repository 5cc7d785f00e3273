"""Lucene classification module — naive Bayes and kNN document classifiers.

Reference: lucene/classification/src/java/org/apache/lucene/classification/
SimpleNaiveBayesClassifier.java and KNearestNeighborClassifier.java (both
train on an existing index: class priors and word/class co-occurrence come
from the term dictionaries and hit counts, not from a separate model).

SimpleNaiveBayesClassifier semantics (java :137-213):

    prior(c)      = ln(docCount(c)) - ln(docsWithClassSize)         (:206-208)
    hits(w, c)    = #docs matching text:w AND class:c               (:190-204)
    den(c)        = avgUniqueTermsPerDoc * docCount(c)
                    + docsWithClassSize                             (:160-188)
    avgUniqueTermsPerDoc = sumDocFreq(text) / docCount(text)        (:183-186)
    loglik(d, c)  = SUM over token occurrences w of ln((hits+1)/den) (:160-178)
    assigned      = argmax_c prior(c) + loglik(d, c), classes iterated in
                    term-dictionary (ascending) order, strict > keeps the
                    first maximum -> ties break to the SMALLEST class (:140-152)
    score         = 10 / |max|                                       (:153)

Spark formulation.  Because every occurrence of the same word contributes
the same ln, and unseen (w, c) pairs contribute ln(0 + 1) = 0, the
occurrence loop regroups exactly into

    loglik(d, c) = SUM_w tf_w * ln(hits(w, c) + 1)  -  dl_d * ln(den(c))

which is one postings->class join + one hash aggregate — no per-token
iteration.  The per-(doc, class) sum folds in term-ascending order
(array_sort + aggregate, the module's fixed-order float discipline); the
DuckDB oracle mirrors the identical regrouped expression
(driver_queries naive-bayes row), so the cross-engine hash is exact.  The
regrouping reassociates the reference's per-occurrence double additions —
rank (argmax class) identity is validated against a literal per-token
pure-Python oracle in tests/test_classification.py.

KNearestNeighborClassifier semantics (java :81-121): build an MLT query
from the doc's text (tf*idf top terms, mintf/mindf gates), take the top-k
BM25 neighbors (the source doc itself is NOT excluded — java :85-94 has no
exclusion clause), majority-vote their class values, score = votes / k.
The reference breaks vote ties by HashMap iteration order (:110-118) —
nondeterministic in Java; this engine pins ties to the smallest class,
documented deviation for determinism.

Scale shape: wc is a term-keyed aggregate (same partitioning as the
postings build — no extra shuffle class); the classify join is term-keyed
against it; class stats are a bounded driver collect (#classes rows); the
argmax is one window over #docs x #classes rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def naive_bayes_classify(
    index: IndexTables,
    class_col: str = "lang",
    max_docid: int | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Classify every doc (docid <= max_docid) against the classes observed
    in ``class_col``, trained on the whole index — the batch analog of
    SimpleNaiveBayesClassifier.assignClass over each doc's own tokens.

    Returns (docid, assigned_class, score) ordered by docid.
    """
    docs = index.docs.select("docid", F.col(class_col).alias("cls"))
    post = index.postings.select("term", "docid", "tf")

    # --- train(): bounded driver-side stats (#classes rows + two counts) ---
    cstats = {
        r.cls: r.nc
        for r in docs.where(F.col("cls").isNotNull())
        .groupBy("cls").agg(F.count("*").alias("nc")).collect()
    }
    docs_with_class = sum(cstats.values())  # countDocsWithClass (java :98-113)
    _tstats = post.agg(
        F.count("*").alias("n"), F.count_distinct("docid").alias("nd")
    ).first()
    sum_doc_freq = _tstats.n  # number of (term, doc) pairs
    doc_count_text = _tstats.nd
    avg_unique = sum_doc_freq / doc_count_text  # java :183-186

    per_class = []  # (cls, prior, ln_den) in ascending class order
    for cls in sorted(cstats):
        nc = cstats[cls]
        prior = math.log(nc) - math.log(docs_with_class)
        ln_den = math.log(avg_unique * nc + docs_with_class)
        per_class.append((cls, prior, ln_den))
    spark = index.postings.sparkSession
    cframe = spark.createDataFrame(
        per_class, "cls string, prior double, ln_den double"
    )

    # --- hits(w, c): postings rows are distinct (term, docid), so a count
    # per (term, class) is the AND-query hit count ---
    wc = (
        post.join(docs.where(F.col("cls").isNotNull()), "docid")
        .groupBy("term", "cls")
        .agg(F.count("*").alias("wc"))
    )

    toks = post if max_docid is None else post.filter(F.col("docid") <= max_docid)
    contrib = toks.join(wc, "term").select(
        "docid", "cls", "term",
        (F.col("tf") * F.log(F.col("wc") + F.lit(1.0))).alias("s"),
    )
    # fixed-order fold: term-ascending addition on both engines
    lsum = (
        contrib.groupBy("docid", "cls")
        .agg(F.array_sort(F.collect_list(F.struct("term", "s"))).alias("_ts"))
        .select(
            "docid", "cls",
            F.aggregate("_ts", F.lit(0.0), lambda a, x: a + x["s"]).alias("lsum"),
        )
    )
    dl = toks.groupBy("docid").agg(F.sum("tf").alias("dl"))

    clval = (
        dl.crossJoin(F.broadcast(cframe))
        .join(lsum, ["docid", "cls"], "left")
        .select(
            "docid", "cls",
            (
                F.col("prior")
                + F.coalesce(F.col("lsum"), F.lit(0.0))
                - F.col("dl") * F.col("ln_den")
            ).alias("v"),
        )
    )
    w = Window.partitionBy("docid").orderBy(F.desc("v"), F.asc("cls"))
    return (
        clval.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "docid",
            F.col("cls").alias("assigned_class"),
            F.round(F.lit(10.0) / F.abs(F.col("v")), round_dp).alias("score"),
        )
        .orderBy(F.asc("docid"))
    )


def knn_classify(
    index: IndexTables,
    docid: int,
    class_col: str = "lang",
    k: int = 10,
    max_query_terms: int = 3,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    round_dp: int = 4,
) -> DataFrame:
    """KNearestNeighborClassifier.assignClass for one source doc: MLT query
    -> top-k BM25 neighbors (self included, java :85-94) -> majority class.

    Returns one row (docid, assigned_class, score) with score = votes / k.
    """
    from lucene_solr_spark.search.bm25 import term_scores

    # Broadcast the doc's bounded term list into the dictionary scan, never
    # the unbounded |V|-row term_stats (see more_like_this, bm25.py).
    rows = (
        index.term_stats()
        .join(
            F.broadcast(
                index.postings.filter(F.col("docid") == docid)
                .select("term", "tf")
            ),
            "term",
        )
        .select("term", "tf", "df")
        .collect()
    )
    n = index.max_doc
    rows = [r for r in rows if r.tf >= min_term_freq and r.df >= min_doc_freq]
    scored_terms = sorted(
        (-r.tf * math.log(1.0 + (n - r.df + 0.5) / (r.df + 0.5)), r.term)
        for r in rows
    )
    terms = [t for _, t in scored_terms[:max_query_terms]]
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame(
            [], "docid long, assigned_class string, score double"
        )

    scored = term_scores(index, terms)
    neighbors = (
        scored.groupBy("docid")
        .agg(F.array_sort(F.collect_list(F.struct("term", "score"))).alias("_ts"))
        .select(
            "docid",
            F.round(
                F.aggregate("_ts", F.lit(0.0), lambda a, x: a + x["score"]),
                round_dp,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k)
    )
    votes = (
        neighbors.join(
            index.docs.select("docid", F.col(class_col).alias("cls")), "docid"
        )
        .groupBy("cls")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.orderBy(F.desc("votes"), F.asc("cls"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.lit(docid).cast("long").alias("docid"),
            F.col("cls").alias("assigned_class"),
            F.round(F.col("votes") / F.lit(float(k)), round_dp).alias("score"),
        )
    )
