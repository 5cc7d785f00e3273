"""FuzzyLikeThisQuery — fuzzified terms ranked by edit score × source IDF.

Reference semantics (public Apache Lucene 4.10.5 source, studied at
/root/reference/lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java and SlowFuzzyTermsEnum.java):

- Each analyzed query term is fuzzified against the live term dictionary:
  candidates share the first ``prefix_length`` characters and have
  ``similarity = 1 - d / (prefixLength + min(len_suffix_src,
  len_suffix_cand))`` strictly above ``min_similarity`` (SlowFuzzyTermsEnum
  :113-142), where ``d`` is the Levenshtein distance of the post-prefix
  remainders.  The enum's boost is ``(similarity - minSim) / (1 - minSim)``
  — 1.0 for an exact match.
- The best ``max_variants_per_term`` variants per source term are rescored
  ``boost² × idf(df_src, N)`` with DefaultSimilarity idf
  (FuzzyLikeThisQuery.java:215-256); a source term absent from the index
  uses the INTEGER average df of its variants.  The global best
  ``max_num_terms`` variants survive.
- The rewritten query is a coord-free SHOULD of variant TermQueries whose
  own df is FORCED to 1 (``new TermQuery(st.term, 1)`` :305,317) so rarer
  misspellings are not favoured — each variant's per-doc contribution is
  ``variant_score × tf_score(tf, df=1)``; ``ignoreTF`` swaps the tf factor
  for a constant 1.

Engine mapping — fully distributed, no driver-side queue: variant discovery
is a dictionary join (term_stats pruned by prefix + JVM ``levenshtein``),
the per-term and global cuts are two windows, and scoring is one postings
semi-join + hash aggregate.  Per-doc float addition is made
engine-deterministic by folding the contributions in ASCENDING VALUE order
(sorted doubles commute exactly; same canonical-order trick as
``to_parent_block_join``) — the DuckDB oracle folds the identical sorted
list (oracle.sqlgen.fuzzy_like_this_sql).

Scale shape: the dictionary scan is prefix-pruned (PushedFilters
StartsWith when prefix_length > 0) and the candidate set is bounded by the
two windows before any postings touch; the postings join is term-pruned to
≤ max_num_terms variants.  One shuffle for each window partition, one for
the final aggregate — no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import IndexTables


def fuzzy_like_this_variants(
    index: IndexTables,
    terms: list[str],
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    max_num_terms: int = 50,
    max_variants_per_term: int = 50,
) -> DataFrame:
    """(sterm, term, variant_score): the surviving fuzzy variants."""
    spark = index.docs.sparkSession
    n = index.max_doc
    src = spark.createDataFrame([(t,) for t in dict.fromkeys(terms)], "sterm string")
    cand = index.term_stats().select("term", "df")
    p = int(prefix_length)
    if p > 0:
        cond = F.substring(F.col("sterm"), 1, p) == F.substring(F.col("term"), 1, p)
    else:
        cond = F.lit(True)
    j = src.join(cand, cond)
    ssuf = F.substring(F.col("sterm"), p + 1, 10_000)
    csuf = F.substring(F.col("term"), p + 1, 10_000)
    d = F.levenshtein(ssuf, csuf)
    sim = F.lit(1.0) - d.cast("double") / (
        F.lit(float(p)) + F.least(F.length(ssuf), F.length(csuf)).cast("double")
    )
    boost = F.when(F.col("term") == F.col("sterm"), F.lit(1.0)).otherwise(
        (sim - F.lit(float(min_similarity))) / F.lit(1.0 - float(min_similarity))
    )
    j = (
        j.withColumn("_sim", sim)
        .withColumn("_boost", boost)
        .where((F.col("term") == F.col("sterm")) | (F.col("_sim") > F.lit(float(min_similarity))))
    )
    # df bookkeeping over ALL enumerated variants (pre-cut, java :228-246):
    # int-division average; source df 0/absent -> the average
    per_src = Window.partitionBy("sterm")
    j = j.withColumn(
        "_avgdf", F.floor(F.sum("df").over(per_src) / F.count(F.lit(1)).over(per_src))
    )
    src_df = cand.select(
        F.col("term").alias("sterm"), F.col("df").alias("_srcdf")
    )
    j = j.join(src_df, "sterm", "left").withColumn(
        "_dfu",
        F.when(
            F.col("_srcdf").isNull() | (F.col("_srcdf") == 0), F.col("_avgdf")
        ).otherwise(F.col("_srcdf")),
    )
    # per-source top variants by enum boost
    w1 = Window.partitionBy("sterm").orderBy(F.desc("_boost"), F.asc("term"))
    j = j.withColumn("_r1", F.row_number().over(w1)).where(
        F.col("_r1") <= max_variants_per_term
    )
    # rescore with the source idf and take the global top max_num_terms
    score = (F.col("_boost") * F.col("_boost")) * (
        F.log(F.lit(float(n)) / (F.col("_dfu").cast("double") + F.lit(1.0))) + F.lit(1.0)
    )
    j = j.withColumn("variant_score", score)
    w2 = Window.orderBy(F.desc("variant_score"), F.asc("term"), F.asc("sterm"))
    return (
        j.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= max_num_terms)
        .select("sterm", "term", "variant_score")
    )


def fuzzy_like_this_topk(
    index: IndexTables,
    query_string: str,
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    max_num_terms: int = 50,
    max_variants_per_term: int = 50,
    ignore_tf: bool = False,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """Top-k for FuzzyLikeThisQuery over the analyzed ``query_string``."""
    terms = list(dict.fromkeys(analyze_text(query_string)))
    if not terms:
        raise ValueError("fuzzy-like-this needs at least one analyzed term")
    variants = fuzzy_like_this_variants(
        index, terms, min_similarity, prefix_length,
        max_num_terms, max_variants_per_term,
    )
    p = index.postings.join(variants, "term")
    if ignore_tf:
        contrib = F.col("variant_score")
    else:
        # TermQuery(term, 1): df forced to 1 so every variant shares the
        # same tf-normalized factor under the engine's BM25 text
        idf1 = F.log(
            F.lit(1.0)
            + (F.lit(float(index.max_doc)) - 1.0 + 0.5) / (F.lit(1.0) + 0.5)
        )
        contrib = F.col("variant_score") * (
            idf1 * F.lit(2.2) * F.col("tf")
            / (
                F.col("tf")
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75) * F.col("dl_approx") / F.lit(float(index.avgdl))
                )
            )
        )
    per_doc = (
        p.select("docid", contrib.alias("_c"))
        .groupBy("docid")
        .agg(F.array_sort(F.collect_list("_c")).alias("_cs"))
        .withColumn(
            "score",
            F.round(
                F.aggregate("_cs", F.lit(0.0), lambda a, x: a + x), round_dp
            ),
        )
    )
    return (
        per_doc.select("docid", "score")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
