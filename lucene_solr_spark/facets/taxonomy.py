"""Taxonomy faceting — the lucene/facet module analog: DrillDownQuery,
DrillSideways, and hierarchical taxonomy counts.

Reference semantics (public Apache Lucene 4.10, /root/reference):

- DrillDownQuery (lucene/facet/src/java/org/apache/lucene/facet/
  DrillDownQuery.java:69-160): base query AND one clause per drilled
  dimension; multiple paths added to the SAME dimension are OR'd inside
  that dimension's clause (``merge()``, DrillDownQuery.java:120-135); the
  drill-down terms are constant-score so they never shape ranking.  A path
  drills into the whole SUBTREE: the doc matches if any of its facet paths
  equals the drill path or extends it.
- DrillSideways (DrillSideways.java:49-214, DrillSidewaysScorer.java): the
  hits are the full drill-down result; the facet counts for each DRILLED
  dimension are computed with that one dimension's clause REMOVED (base +
  every other dimension still applied) so the dimension's sibling values
  don't vanish after the user drills into it; dimensions NOT drilled on are
  counted over the full drill-down set.  The scorer implements this as a
  near-miss pass (docs failing at most one clause); here the same idea is
  ONE scan with per-doc dimension flags and N conditional aggregates — no
  per-dimension re-query, no second scan.
- Taxonomy counts (taxonomy/TaxonomyFacetCounts.java:39-90,
  FacetsConfig.java path handling): facet labels are hierarchical paths
  ``dim/component/...``; ``getTopChildren(n, dim, path...)`` returns the
  immediate children under the given path ordered count-desc, where a
  child's count is the number of docs carrying any path in that child's
  subtree (the rollup), each doc counted once per child
  (ordinals are per-doc sets).  Ties break label-asc here (the reference
  breaks ties by taxonomy ordinal = insertion order, which has no stable
  cross-engine analog).

Tests the reference runs against this module: TestDrillSideways.java,
taxonomy/TestTaxonomyFacetCounts.java.

Scale shape: the per-doc dimension flags are ``F.exists`` over the facet
path array (whole-stage codegen, no shuffle); the sideways counts are one
explode + one distinct + one hash aggregate over (dim, child) — a single
pass over the corpus regardless of how many dimensions are drilled.  At
1000 executors the (dim, child) key space is the facet vocabulary, which
hash-aggregates with map-side partials; no per-dimension re-scan, which is
exactly what separates this from running k+1 drill-down queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# FacetsConfig.pathToString joins with ''; '/' here (documented
# divergence — the testdata labels never contain '/').
SEP = "/"


def facet_path(dim: str, *components: str) -> str:
    """DrillDownQuery.term analog: the stored label of a facet path."""
    return SEP.join((dim, *components))


def _subtree_match(paths_col: Column, dim: str, path: tuple[str, ...]) -> Column:
    """Doc-level predicate: any stored path equals dim/path or extends it."""
    full = facet_path(dim, *path)
    return F.exists(
        paths_col,
        lambda p: (p == full) | p.startswith(full + SEP),
    )


def _dim_flag(paths_col: Column, dim: str, paths: list[tuple[str, ...]]) -> Column:
    """OR of the dimension's drill paths (DrillDownQuery.merge semantics)."""
    flag = F.lit(False)
    for path in paths:
        flag = flag | _subtree_match(paths_col, dim, path)
    return flag


def drill_down(
    docs: DataFrame,
    drills: dict[str, list[tuple[str, ...]]],
    base: Column | None = None,
    paths_col: str = "facets",
) -> DataFrame:
    """DrillDownQuery: docs matching ``base`` AND every dimension's drill
    (paths within one dimension OR'd).  ``drills`` maps dim -> list of
    path tuples.  Pure filter — constant-score by construction."""
    out = docs
    if base is not None:
        out = out.where(base)
    for dim, paths in drills.items():
        out = out.where(_dim_flag(F.col(paths_col), dim, paths))
    return out


def drill_sideways_counts(
    docs: DataFrame,
    drills: dict[str, list[tuple[str, ...]]],
    dims: list[str],
    base: Column | None = None,
    paths_col: str = "facets",
    id_col: str = "doc_id",
    top_n: int = 10,
    base_docids: DataFrame | None = None,
) -> DataFrame:
    """DrillSideways facet counts in ONE pass: (dim, label, count) rows,
    top_n per dim, ordered (dim asc, count desc, label asc).

    For a drilled dim the counts are computed with that dim's clause
    removed; for an undrilled dim with every clause applied
    (DrillSideways.search, DrillSideways.java:133-175).  Labels are the
    dim's top-level children."""
    drilled = list(drills.keys())
    pc = F.col(paths_col)

    # per-doc flags: b_<dim> = passes that dim's drill; _nf = #failed dims
    flagged = docs
    if base is not None:
        flagged = flagged.where(base)
    if base_docids is not None:
        # DrillSideways over a real base QUERY (DrillSideways.search's
        # baseQuery): the base's matching DocSet semi-joins in — never an
        # isin over a collected set, so a 10^9-hit base stays distributed
        flagged = flagged.join(
            base_docids.select(F.col(base_docids.columns[0]).alias(id_col)),
            id_col,
            "left_semi",
        )
    nf = F.lit(0)
    for dim in drilled:
        b = _dim_flag(pc, dim, drills[dim])
        flagged = flagged.withColumn(f"_b_{dim}", b)
        nf = nf + F.when(F.col(f"_b_{dim}"), 0).otherwise(1)
    flagged = flagged.withColumn("_nf", nf)
    # near-miss pruning (DrillSidewaysScorer's contract): only docs failing
    # zero clauses (count everywhere) or exactly one (count in the failed
    # dim's sideways set) can contribute — a 2+-miss doc never counts.
    flagged = flagged.where(F.col("_nf") <= 1)

    exploded = flagged.select(
        F.col(id_col).alias("_docid"),
        "_nf",
        *[F.col(f"_b_{d}") for d in drilled],
        F.explode(pc).alias("_path"),
    ).withColumn("_dim", F.split("_path", SEP).getItem(0))
    exploded = exploded.where(F.col("_dim").isin(dims)).withColumn(
        "_label", F.split("_path", SEP).getItem(1)
    )

    # relief: a row of a DRILLED dim forgives its own dim's failure
    relief = F.lit(0)
    for dim in drilled:
        relief = F.when(
            (F.col("_dim") == dim) & ~F.col(f"_b_{dim}"), 1
        ).otherwise(relief)
    ok = (F.col("_nf") - relief) == 0

    counted = (
        exploded.where(ok)
        .select("_docid", F.col("_dim").alias("dim"), F.col("_label").alias("label"))
        .distinct()
        .groupBy("dim", "label")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    rn = F.row_number().over(
        Window.partitionBy("dim").orderBy(F.desc("count"), F.asc("label"))
    )
    return (
        counted.withColumn("_rn", rn)
        .where(F.col("_rn") <= top_n)
        .drop("_rn")
        .orderBy(F.asc("dim"), F.desc("count"), F.asc("label"))
    )


def taxonomy_top_children(
    docs: DataFrame,
    dim: str,
    path: tuple[str, ...] = (),
    paths_col: str = "facets",
    id_col: str = "doc_id",
    top_n: int = 10,
) -> DataFrame:
    """TaxonomyFacetCounts.getTopChildren(n, dim, path...): the immediate
    children under dim/path with rolled-up doc counts (a doc counts once
    per child subtree), ordered (count desc, label asc), top_n."""
    prefix = facet_path(dim, *path)
    depth = 1 + len(path)  # index of the child segment in the split path
    exploded = docs.select(
        F.col(id_col).alias("_docid"),
        F.explode(paths_col).alias("_path"),
    ).where(F.col("_path").startswith(prefix + SEP))
    children = (
        exploded.select(
            "_docid", F.split("_path", SEP).getItem(depth).alias("label")
        )
        .where(F.col("label").isNotNull())
        .distinct()
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("label"))
        .limit(top_n)
    )
    return children


def with_document_taxonomy(docs: DataFrame) -> DataFrame:
    """The testdata documents table with its synthesized facet-path column
    (the FacetsConfig.build analog over the columns the table carries):

    - ``lang/<lang>``                     — flat dimension
    - ``source/<source>``                 — flat dimension
    - ``size/<n_chars//100*100>/<n_chars//10*10>`` — 2-level hierarchy

    Deterministic and reproducible in SQL, so both engines derive the
    identical taxonomy."""
    b100 = (F.floor(F.col("n_chars") / 100) * 100).cast("int").cast("string")
    b10 = (F.floor(F.col("n_chars") / 10) * 10).cast("int").cast("string")
    return docs.withColumn(
        "facets",
        F.array(
            F.concat(F.lit("lang" + SEP), F.col("lang")),
            F.concat(F.lit("source" + SEP), F.col("source")),
            F.concat(F.lit("size" + SEP), b100, F.lit(SEP), b10),
        ),
    )


def taxonomy_sum_value(
    docs: DataFrame,
    dim: str,
    path: tuple[str, ...] = (),
    value_col: str = "n_chars",
    paths_col: str = "facets",
    id_col: str = "doc_id",
    top_n: int = 10,
) -> DataFrame:
    """TaxonomyFacetSumValueSource (lucene/facet/.../taxonomy/
    TaxonomyFacetSumValueSource.java:47-130; the int/float association
    variants TaxonomyFacetSumIntAssociations sum a stored per-(doc,
    category) weight — the per-doc ValueSource form implemented here is the
    SumValueSource contract): for every matching doc, add value(doc) to
    each of its categories under dim/path, once per (doc, child) subtree
    like the count rollup.  Returns (label, total) ordered
    (total desc, label asc), top_n.  Same one-explode/dedup/hash-agg scale
    shape as taxonomy_top_children — the value rides the deduped frame."""
    prefix = facet_path(dim, *path)
    depth = 1 + len(path)
    exploded = docs.select(
        F.col(id_col).alias("_docid"),
        F.col(value_col).cast("double").alias("_v"),
        F.explode(paths_col).alias("_path"),
    ).where(F.col("_path").startswith(prefix + SEP))
    return (
        exploded.select(
            "_docid", "_v", F.split("_path", SEP).getItem(depth).alias("label")
        )
        .where(F.col("label").isNotNull())
        .distinct()
        .groupBy("label")
        .agg(F.sum("_v").alias("total"))
        .orderBy(F.desc("total"), F.asc("label"))
        .limit(top_n)
    )


def sampled_top_children(
    docs: DataFrame,
    dim: str,
    path: tuple[str, ...] = (),
    paths_col: str = "facets",
    id_col: str = "doc_id",
    top_n: int = 10,
    sample_permille: int = 500,
    seed: str = "s0",
    amortize: bool = True,
) -> DataFrame:
    """RandomSamplingFacetsCollector + amortizeFacetCounts
    (lucene/facet/.../RandomSamplingFacetsCollector.java:43-262): count
    facets over a RANDOM SAMPLE of the matching docs to find the top-n
    candidate labels cheaply, then (amortize) replace the sampled counts
    with EXACT counts computed for just those n labels — the reference's
    per-label drill-down recount, here ONE pruned aggregation with the
    candidate set broadcast.  The label ORDER stays the sampled ranking
    (amortizeFacetCounts fixes values in place, java :226-262).

    The sample is a deterministic hash Bernoulli (the portable 60-bit hash
    over seed#docid, shared with the SQL oracle) rather than the
    reference's XORShift stream — the reference's sample is
    iteration-order-dependent and unreproducible across engines by
    construction; a content-hash sample keeps the SAME statistical
    contract and is parallelism-invariant, which is what a distributed
    engine needs anyway.

    Scale shape (100 TB): the sampled pass prunes at the SCAN (the hash
    predicate pushes down; ~permille/1000 of the corpus feeds the explode),
    and the exact pass explodes only rows whose path prefix matches, then
    prunes to the n candidate labels BEFORE the dedup shuffle."""
    from lucene_solr_spark.hashing import hash64_col

    prefix = facet_path(dim, *path)
    depth = 1 + len(path)
    h = hash64_col(
        F.concat(F.lit(seed + "#"), F.col(id_col).cast("string"))
    ) % 1000
    cand = taxonomy_top_children(
        docs.where(h < sample_permille), dim, path, paths_col, id_col, top_n
    ).withColumnRenamed("count", "sampled_count")
    if not amortize:
        return cand
    exploded = docs.select(
        F.col(id_col).alias("_docid"),
        F.explode(paths_col).alias("_path"),
    ).where(F.col("_path").startswith(prefix + SEP))
    exact = (
        exploded.select(
            "_docid", F.split("_path", SEP).getItem(depth).alias("label")
        )
        .join(F.broadcast(cand.select("label")), "label", "left_semi")
        .distinct()
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return (
        cand.join(exact, "label")
        .select("label", "count", "sampled_count")
        .orderBy(F.desc("sampled_count"), F.asc("label"))
    )


def drill_down_scored(
    index,
    query_terms: list[str],
    taxo_docs: DataFrame,
    drills: dict[str, list[tuple[str, ...]]],
    k: int = 10,
    paths_col: str = "facets",
    id_col: str = "doc_id",
) -> DataFrame:
    """DrillDownQuery with a scored base query (DrillDownQuery.java:96-103:
    baseQuery MUST + one constant-score clause per drilled dim) — the
    reference's faceted-search flow: hits are ranked by the BASE query's
    BM25 scores alone, the drills only filter.

    Plan shape: the drill predicate evaluates on the taxonomy frame
    (codegen, no shuffle), reduces to a docid set, and semi-joins into the
    scored search — the filter applies BEFORE the top-k cut, exactly where
    a Solr fq sits."""
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    allowed = drill_down(taxo_docs, drills, paths_col=paths_col).select(
        F.col(id_col).cast("long").alias("docid")
    )
    scored = search(
        index, BooleanQuery.of(should=query_terms), k=1 << 31, ordered=False
    )
    return (
        scored.join(allowed, "docid", "left_semi")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )
