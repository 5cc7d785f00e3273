"""Faceting & stats — Solr SimpleFacets/StatsComponent/Grouping re-expressed.

Reference semantics (public Apache Solr 4.10.5, /root/reference):

- facet.field (SimpleFacets.java:341-516, DocValuesFacets.java:62-141):
  per-term counts over the result DocSet; sort=count -> count desc with ties
  by term index order (ascending term); sort=index -> term asc; mincount,
  limit, offset, prefix supported.  The SOLR-5894 sparse-counter machinery
  (solr/core/.../request/sparse/, 7.2k LoC) exists to avoid touching
  zero-count buckets — Spark's hash aggregate only materializes touched keys,
  so *sparse counting is the native behavior here*; what we preserve is count
  EXACTNESS and ordering semantics.  Distributed refinement
  (FacetComponent.java:130-239) collapses into Spark's exact partial+final
  aggregation — one shuffle, no over-request, no fine-counting round.
- facet.query (SimpleFacets.java:287), facet.range (:1295-1374), interval
  facets (IntervalFacets.java:101,221-249), pivot facets
  (PivotFacetProcessor.java), stats (StatsValuesFactory.java:44-64,257-306),
  grouping/collapse (Grouping.java:79,160-203; CollapsingQParserPlugin.java),
  terms component (TermsComponent.java).

Every function takes a "result set" DataFrame (the DocSet analog: any
DataFrame of matching docs joined with docvalues columns) and returns a
DataFrame, so facets compose with any query from search/bm25.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def facet_field(
    results: DataFrame,
    field: str,
    limit: int = 20,
    offset: int = 0,
    mincount: int = 1,
    sort: str = "count",
    prefix: str | None = None,
    multivalued: bool = False,
    missing: bool = False,
) -> DataFrame:
    """facet.field: (term, count) with Solr ordering semantics.

    ``missing=True`` appends the facet.missing bucket — the count of result
    docs with a NULL field value — as a final row with NULL facet_term,
    after the limited term list (SimpleFacets.java:516 missing handling)."""
    col = F.explode(field) if multivalued else F.col(field)
    base_all = results.select(col.alias("facet_term"))
    base = base_all
    if prefix:
        base = base.where(F.col("facet_term").startswith(prefix))
    counts = (
        base.where(F.col("facet_term").isNotNull())
        .groupBy("facet_term")
        .agg(F.count(F.lit(1)).alias("facet_count"))
    )
    counts = counts.where(F.col("facet_count") >= mincount)
    if sort == "count":
        counts = counts.orderBy(F.col("facet_count").desc(), F.col("facet_term").asc())
    else:  # index order
        counts = counts.orderBy(F.col("facet_term").asc())
    out = counts.limit(offset + limit)
    if offset:
        out = out.offset(offset)
    if missing:
        # facet.missing counts NULL-valued docs REGARDLESS of facet.prefix
        # (SimpleFacets.java:516 — the missing count is computed before
        # prefix filtering; startswith(NULL) would also silently drop every
        # NULL row), and the NULL literal takes the field's own type so the
        # union never coerces the term column
        miss = base_all.where(F.col("facet_term").isNull()).agg(
            F.lit(None)
            .cast(base_all.schema["facet_term"].dataType)
            .alias("facet_term"),
            F.count(F.lit(1)).alias("facet_count"),
        )
        out = out.unionAll(miss)
    return out


def facet_query(results: DataFrame, queries: dict[str, Column]) -> DataFrame:
    """facet.query: one count per named predicate, computed in ONE pass
    (conditional aggregation — no per-facet scan)."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in queries.items()
    ]
    wide = results.agg(*aggs)
    # unpivot to (facet_name, facet_count), stable name order
    names = list(queries)
    pairs = F.array(*[
        F.struct(F.lit(n).alias("facet_name"), F.col(n).alias("facet_count"))
        for n in names
    ])
    return (
        wide.select(F.explode(pairs).alias("p"))
        .select("p.facet_name", "p.facet_count")
    )


def facet_range(
    results: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
) -> DataFrame:
    """facet.range: fixed-gap buckets [start+i*gap, start+(i+1)*gap).
    Returns (bucket_start, facet_count), index-ordered."""
    c = F.col(field).cast("double")
    in_range = results.where((c >= start) & (c < end))
    bucket = (F.floor((c - F.lit(start)) / F.lit(gap)) * F.lit(gap) + F.lit(start))
    out = (
        in_range.select(bucket.alias("bucket_start"))
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).alias("facet_count"))
        .orderBy("bucket_start")
    )
    return out


def facet_range_extended(
    results: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
    include_upper: bool = False,
    hardend: bool = True,
    others: tuple[str, ...] = (),
) -> DataFrame:
    """facet.range with the include/other flags (SimpleFacets.java:1295-1374,
    RangeEndpointCalculator):

    - ``include_upper``: buckets are (lo, hi] instead of the default [lo, hi)
      (facet.range.include=upper vs lower).
    - ``hardend=False``: the last bucket stretches to cover the remainder
      when (end-start) is not a multiple of gap.
    - ``others``: any of "before" (< start), "after" (> end), "between" —
      appended as labeled rows (facet.range.other).

    Returns (bucket, facet_count) where bucket is the bucket start rendered
    as a string, with before/after/between labeled rows appended."""
    c = F.col(field).cast("double")
    n_buckets = int(-(-(end - start) // gap))  # ceil
    real_end = start + n_buckets * gap
    hi_end = end if hardend else real_end
    lo_cmp = (c > start) if include_upper else (c >= start)
    hi_cmp = (c <= hi_end) if include_upper else (c < hi_end)
    in_range = results.where(lo_cmp & hi_cmp)
    if include_upper:  # (lo, hi]: value == lo+i*gap belongs to bucket i-1
        bucket_i = F.ceil((c - F.lit(start)) / F.lit(gap)) - F.lit(1)
    else:  # [lo, hi)
        bucket_i = F.floor((c - F.lit(start)) / F.lit(gap))
    if not hardend:
        bucket_i = F.least(bucket_i, F.lit(n_buckets - 1))
    bucket_val = bucket_i * F.lit(gap) + F.lit(start)
    # integral start/gap render as integers; fractional grids keep the
    # double rendering (a blanket long-cast would merge bucket starts 0.0
    # and 0.5 into one '0' bucket)
    if float(gap).is_integer() and float(start).is_integer():
        bucket = bucket_val.cast("long").cast("string")
    else:
        bucket = bucket_val.cast("double").cast("string")
    out = (
        in_range.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("facet_count"))
    )
    extras = []
    if "before" in others:
        pred = (c <= start) if include_upper else (c < start)
        extras.append(("before", pred))
    if "after" in others:
        pred = (c > hi_end) if include_upper else (c >= hi_end)
        extras.append(("after", pred))
    if "between" in others:
        extras.append(("between", lo_cmp & hi_cmp))
    for label, pred in extras:
        row = results.agg(
            F.lit(label).alias("bucket"),
            F.sum(pred.cast("long")).alias("facet_count"),
        )
        out = out.unionAll(row)
    return out.orderBy("bucket")


def interval_facets(
    results: DataFrame, field: str, intervals: list[tuple[str, float | None, float | None]]
) -> DataFrame:
    """IntervalFacets: arbitrary [lo, hi] inclusive intervals, one pass."""
    c = F.col(field).cast("double")
    preds = {}
    for label, lo, hi in intervals:
        p = F.lit(True)
        if lo is not None:
            p = p & (c >= lo)
        if hi is not None:
            p = p & (c <= hi)
        preds[label] = p
    return facet_query(results, preds)


def pivot_facets(
    results: DataFrame, fields: list[str], limit: int = 100, mincount: int = 1
) -> DataFrame:
    """facet.pivot: nested field1,field2,... counts, flattened to one row per
    leaf path, ordered by (count desc, terms asc) like distributed pivots."""
    counts = (
        results.groupBy(*fields)
        .agg(F.count(F.lit(1)).alias("facet_count"))
        .where(F.col("facet_count") >= mincount)
    )
    order = [F.col("facet_count").desc()] + [F.col(f).asc() for f in fields]
    return counts.orderBy(*order).limit(limit)


def stats_component(
    results: DataFrame, field: str, calcdistinct: bool = False
) -> DataFrame:
    """StatsComponent: min/max/sum/count/missing/sumOfSquares/mean/stddev.
    stddev is Solr's sample-ish formula sqrt((sumsq - sum^2/N) / (N-1))
    (StatsValuesFactory.java:257-306) == stddev_samp.
    ``calcdistinct`` adds countDistinct (StatsValuesFactory.java:44-64)."""
    c = F.col(field).cast("double")
    aggs = [
        F.min(c).alias("stats_min"),
        F.max(c).alias("stats_max"),
        F.sum(c).alias("stats_sum"),
        F.count(c).alias("stats_count"),
        F.sum(F.isnull(c).cast("long")).alias("stats_missing"),
        F.sum(c * c).alias("stats_sumsq"),
        F.avg(c).alias("stats_mean"),
        F.stddev_samp(c).alias("stats_stddev"),
    ]
    if calcdistinct:
        aggs.append(F.countDistinct(c).alias("stats_distinct"))
    return results.agg(*aggs)


def stats_component_string(
    results: DataFrame, field: str, calcdistinct: bool = False
) -> DataFrame:
    """StatsComponent over a string field (StatsValuesFactory.java:62,
    StringStatsValues:490-540): only min/max (String.compareTo order) /
    count/missing — the numeric moments are undefined for strings and the
    reference emits none."""
    c = F.col(field)
    aggs = [
        F.min(c).alias("stats_min"),
        F.max(c).alias("stats_max"),
        F.count(c).alias("stats_count"),
        F.sum(F.isnull(c).cast("long")).alias("stats_missing"),
    ]
    if calcdistinct:
        aggs.append(F.countDistinct(c).alias("stats_distinct"))
    return results.agg(*aggs)


def group_topk(
    results: DataFrame,
    group_field: str,
    order_by: list[Column],
    k: int = 1,
    offset: int = 0,
) -> DataFrame:
    """Grouping (field collapse): top-k rows per group by the given ordering.
    Solr's two-pass TermFirst/SecondPassGroupingCollector becomes one window.
    ``offset`` is group.offset (Grouping.java:95,164 groupOffset): skip the
    first N rows WITHIN each group before taking k."""
    w = Window.partitionBy(group_field).orderBy(*order_by)
    return (
        results.withColumn("group_rank", F.row_number().over(w))
        .where(
            (F.col("group_rank") > offset) & (F.col("group_rank") <= offset + k)
        )
    )


def collapse(results: DataFrame, group_field: str, order_by: list[Column]) -> DataFrame:
    """CollapsingQParserPlugin: keep only the best row per group."""
    return group_topk(results, group_field, order_by, k=1).drop("group_rank")


def expand_component(
    results: DataFrame,
    group_field: str,
    order_by: list[Column],
    expand_rows: int = 5,
) -> DataFrame:
    """ExpandComponent (solr/core/.../component/ExpandComponent.java): for
    each group surviving a collapse, return the group members HIDDEN by the
    collapse — everything except the head row — up to ``expand_rows`` per
    group, in the expand sort order.  One window pass: rank per group, keep
    ranks 2..expand_rows+1 (rank 1 is the collapsed head the main result
    already shows)."""
    w = Window.partitionBy(group_field).orderBy(*order_by)
    return (
        results.withColumn("expand_rank", F.row_number().over(w))
        .where(
            (F.col("expand_rank") >= 2)
            & (F.col("expand_rank") <= expand_rows + 1)
        )
    )


def terms_component(
    segments: DataFrame,
    limit: int = 20,
    prefix: str | None = None,
    lower: str | None = None,
    upper: str | None = None,
    lower_incl: bool = True,
    upper_incl: bool = False,
    regex: str | None = None,
    mincount: int = 1,
    maxcount: int | None = None,
    sort: str = "count",
) -> DataFrame:
    """TermsComponent: raw dictionary enumeration (term, df).

    Param gates per TermsComponent.java:103-115: ``terms.lower``/``upper``
    with inclusivity flags (:105-106 — lower inclusive, upper exclusive by
    default), ``terms.regexp`` (full-match over the term, like the
    AutomatonQuery anchor), ``terms.mincount``/``maxcount`` df bounds
    (:109-110), ``terms.sort`` = count (df desc) or index (term asc)
    (:107-108)."""
    t = segments.select("term", "df")
    if prefix:
        t = t.where(F.col("term").startswith(prefix))
    c = F.col("term")
    if lower is not None:
        t = t.where(c >= lower if lower_incl else c > lower)
    if upper is not None:
        t = t.where(c <= upper if upper_incl else c < upper)
    if regex is not None:
        t = t.where(c.rlike(f"^(?:{regex})$"))
    if mincount > 1:
        t = t.where(F.col("df") >= mincount)
    if maxcount is not None:
        t = t.where(F.col("df") <= maxcount)
    order = (
        [F.col("term").asc()]
        if sort == "index"
        else [F.col("df").desc(), F.col("term").asc()]
    )
    return t.orderBy(*order).limit(limit)


def group_queries(
    frames: dict[str, DataFrame], k_per_group: int = 10
) -> DataFrame:
    """group.query (Grouping.java CommandQuery:912-975): each named query
    defines a group; the response holds each group's top-k scored docs.
    ``frames`` maps group name -> a scored (docid, score) frame; output is
    (group_query, docid, score) ordered per group by score desc / docid asc.
    Groups are independent top-ks — Spark unions the bounded heads, so no
    group's size leaks into another's plan."""
    out = None
    for name, df in frames.items():
        head = (
            df.orderBy(F.col("score").desc(), F.col("docid").asc())
            .limit(k_per_group)
            .select(F.lit(name).alias("group_query"), "docid", "score")
        )
        out = head if out is None else out.unionAll(head)
    if out is None:
        raise ValueError("group.query needs >= 1 query")
    return out


def group_func(
    results: DataFrame,
    func: str,
    order_by: list[Column],
    k: int = 1,
    offset: int = 0,
    now_epoch_ms: int | None = None,
) -> DataFrame:
    """group.func (Grouping.java CommandFunc:912-975, grouped by a
    ValueSource — the FunctionQuery's value per doc): identical window
    machinery to group.field, keyed on the compiled function Column.
    ``results`` must carry the columns the function references.  Output adds
    ``group_value`` (the function's value for the group)."""
    from lucene_solr_spark.functions import parse_function_query

    gcol = parse_function_query(func, now_epoch_ms=now_epoch_ms)
    keyed = results.withColumn("group_value", gcol)
    w = Window.partitionBy("group_value").orderBy(*order_by)
    return (
        keyed.withColumn("group_rank", F.row_number().over(w))
        .where(
            (F.col("group_rank") > offset) & (F.col("group_rank") <= offset + k)
        )
        .drop("group_rank")
    )


def stats_percentiles(
    results: DataFrame, field: str, percentiles: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Percentile statistics over a numeric field — the solr/contrib/
    analytics ``percentile(n, expr)`` expression family (the AnalyticsComponent
    statistics facets; StatsComponent itself gained percentiles later via
    t-digest — this is the EXACT variant the contrib computes).

    One row with a ``pct_<n>`` column per requested fraction; both engines
    use the same linear-interpolation definition (Spark ``percentile`` ==
    DuckDB ``quantile_cont`` over DOUBLE).  Exact percentiles shuffle the
    field column once; the documented 100-TB swap is approx_percentile
    (t-digest), which is also what Solr itself ships at scale."""
    c = F.col(field).cast("double")
    row = results.agg(
        F.percentile(c, F.lit(list(float(p) for p in percentiles))).alias("_ps")
    )
    cols = [
        F.col("_ps")[i].alias(f"pct_{int(round(p * 100))}")
        for i, p in enumerate(percentiles)
    ]
    return row.select(*cols)


def group_main(
    results: DataFrame,
    group_field: str,
    order_by: list[Column],
    group_limit: int = 1,
    rows: int = 10,
) -> DataFrame:
    """group.main=true / group.format=simple (Grouping.java mainResult +
    Format.simple): the grouped heads FLATTENED back into one plain doc
    list — groups ordered by their best row, ``group_limit`` rows kept per
    group, then the flat list cut at ``rows`` like an ungrouped response.
    One extra window for the group ordering key (the head row's sort
    value); no driver work."""
    heads = group_topk(results, group_field, order_by, k=group_limit)
    # order the GROUPS by their head (rank-1) row under the same sort spec:
    # a global row_number over the one-row-per-group heads — bounded by the
    # group count, the same single-partition moment Solr's group merge has
    grank = (
        heads.where(F.col("group_rank") == 1)
        .select(
            group_field,
            F.row_number().over(Window.orderBy(*order_by)).alias("_grank"),
        )
    )
    return (
        heads.join(grank, group_field)
        .orderBy(F.col("_grank"), F.col("group_rank"))
        .drop("_grank", "group_rank")
        .limit(rows)
    )
