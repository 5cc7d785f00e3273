"""The /select request facade — SearchHandler's component pipeline as one
dict-in / dict-out call.

Reference flow (SURVEY §3.1): SolrDispatchFilter routes ``/select`` to
SearchHandler.handleRequestBody (solr/core/.../component/SearchHandler.java:
169-253), which runs the component pipeline — QueryComponent (q/fq/sort/
start/rows/fl), FacetComponent, HighlightComponent, the grouping path — over
one SolrQueryRequest.  This module is that front door for the Spark engine:
a reference user's request params run unchanged semantics end-to-end.

Supported params (the common-params working set, CommonParams.java /
FacetParams.java / HighlightParams.java):

  q                query string; ``{!type ...}`` local-params dispatch via
                   the QParser registry, classic grammar otherwise
  fq               list of filter queries (DocSet intersect; {!collapse}
                   post-filter composes; filters never score)
  sort             "score desc" (default) or "field asc|desc, ..." over
                   docvalues columns; docid-asc final tie-break
  start, rows      result window (offset paging)
  fl               return-fields spec (renames, function pseudo-fields, *)
  facet.field      list of fields -> (facet_term, facet_count) frames
  facet.query      {label: query string} -> counts over the filtered set
  hl, hl.fl        highlighting over the stored text of the result page
  group.field,     grouped results: top group.limit docs per group value
  group.limit

Returns ``{"response": DataFrame, "num_found": int, "facet_fields": {...},
"facet_queries": DataFrame|None, "highlighting": DataFrame|None,
"grouped": DataFrame|None}``.

Scale shape: the scored set is computed once; facets/grouping/highlighting
are independent consumers of that one frame (Spark re-derives each plan from
the same lineage — at cluster scale a ``.persist()`` of the filtered scored
set amortizes the consumers, which ``select(..., persist=True)`` does).
Highlighting joins the k-row page broadcast into the stored-fields scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_solr_spark.index.builder import IndexTables

_MAX_ROWS = (1 << 31) - 1


def _query_terms(parsed) -> list[str]:
    """Terms of a parsed query tree (HighlightComponent derives highlight
    terms from the rewritten query — Highlighter's QueryTermExtractor)."""
    from lucene_solr_spark.search.parser import CompositeQuery
    from lucene_solr_spark.search.query import BooleanQuery, PhraseQuery, TermQuery

    if isinstance(parsed, CompositeQuery):
        out = _query_terms(parsed.boolean)
        for sub in (*parsed.must_specials, *parsed.should_specials):
            out.extend(_query_terms(sub))
        return out
    if isinstance(parsed, BooleanQuery):
        return [t.term for t in (*parsed.must, *parsed.should)]
    if isinstance(parsed, TermQuery):
        return [parsed.term]
    if isinstance(parsed, PhraseQuery):
        return list(parsed.terms)
    return []


def _split_sort(spec: str | None) -> list[tuple[str, str]]:
    """'key asc|desc, ...' -> [(key, dir)]; keys may be function-query
    strings with commas inside parens (sort=geodist(lat,lon,48.8,2.3) asc —
    SortSpecParsing.parseSortSpec handles the same shapes)."""
    spec = (spec or "score desc").strip()
    parts, depth, cur = [], 0, []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for part in parts:
        part = part.strip()
        if not part:
            continue
        toks = part.rsplit(None, 1)
        if len(toks) == 2 and toks[1].lower() in ("asc", "desc"):
            out.append((toks[0], toks[1].lower()))
        else:
            out.append((part, "asc"))
    return out


def _parse_sort(
    spec: str | None,
    now_epoch_ms: int | None = None,
    sort_missing: str | None = None,
) -> tuple[list, list[str]]:
    """-> (ordering columns, stored field names the ordering needs); 'score
    desc' is the default; a key containing '(' compiles as a function query
    (sort by function, ValueSourceParser); docid asc is always the final
    tie-break (HitQueue docID order).

    ``sort_missing``: the schema's sortMissingLast/sortMissingFirst
    (FieldType.java SORT_MISSING_LAST/FIRST — Solr puts docs without the
    sort field at the chosen end regardless of direction).  None keeps
    Spark's default (nulls first asc / last desc — the unset-attribute
    Lucene default of sorting missing as field-type zero differs; pass an
    explicit policy for schema parity)."""
    cols, fields = [], []
    for name, direction in _split_sort(spec):
        if "(" in name:
            from lucene_solr_spark.functions import parse_function_query

            c = parse_function_query(name, now_epoch_ms=now_epoch_ms)
            import re as _re

            fields.extend(
                t
                for t in _re.findall(r"[A-Za-z_][A-Za-z0-9_]*", name)
                if t not in ("score", "docid")
            )
        else:
            c = F.col(name)
            if name not in ("score", "docid"):
                fields.append(name)
        if sort_missing == "last":
            cols.append(
                c.desc_nulls_last() if direction == "desc" else c.asc_nulls_last()
            )
        elif sort_missing == "first":
            cols.append(
                c.desc_nulls_first() if direction == "desc" else c.asc_nulls_first()
            )
        else:
            cols.append(c.desc() if direction == "desc" else c.asc())
    cols.append(F.col("docid").asc())
    return cols, fields


def _scored_set(index: IndexTables, q: str, now_epoch_ms: int | None) -> DataFrame:
    """The UNLIMITED scored set for the main query (getDocListNC computes the
    full DocList; windows apply later)."""
    from lucene_solr_spark.search.bm25 import search, search_parsed
    from lucene_solr_spark.search.qparsers import qparser_search
    from lucene_solr_spark.search.query import MatchAllQuery

    if q.strip() == "*:*":
        return search(index, MatchAllQuery(), k=_MAX_ROWS)
    if q.lstrip().startswith("{!"):
        return qparser_search(
            index, q, k=_MAX_ROWS, now_epoch_ms=now_epoch_ms
        )
    return search_parsed(index, q, k=_MAX_ROWS)


def select(
    index: IndexTables,
    params: dict,
    stored: DataFrame | None = None,
    now_epoch_ms: int | None = None,
    persist: bool = False,
) -> dict:
    """Run a /select-style request over the index.  ``stored`` supplies the
    stored-fields frame for fl fields and highlighting (defaults to
    ``index.docs``)."""
    from lucene_solr_spark.search.filtercache import (
        _apply_collapse,
        _parse_filter,
    )
    from lucene_solr_spark.search.parser import parse_query

    q = params.get("q", "*:*")
    stored = stored if stored is not None else index.docs

    scored = _scored_set(index, q, now_epoch_ms)

    # --- fq composition (getProcessedFilter; {!collapse} is a PostFilter).
    # {!tag=...} on an fq registers it for multi-select faceting: a
    # facet.field of the form {!ex=tag}field recomputes its counts WITHOUT
    # the tagged filters (SimpleFacets.getFieldMissingCount /
    # QueryParsing tag-exclusion — the standard multi-select pattern). ---
    from lucene_solr_spark.search.qparsers import parse_local_params

    fqs = params.get("fq", []) or []
    if isinstance(fqs, str):
        fqs = [fqs]
    collapse_fqs = [f for f in fqs if f.lstrip().startswith("{!collapse")]
    applied_filters: list[tuple[set, str, DataFrame]] = []  # (tags, kind, df)
    for fq in fqs:
        if fq in collapse_fqs:
            continue
        tags: set = set()
        if fq.lstrip().startswith("{!"):
            _t, lp, _b = parse_local_params(fq)
            tags = {t for t in str(lp.get("tag", "")).split(",") if t}
        kind, df = _parse_filter(index, fq, now_epoch_ms=now_epoch_ms)
        applied_filters.append((tags, kind, df))
        how = "left_anti" if kind == "neg" else "left_semi"
        scored = scored.join(df, "docid", how)
    for cfq in collapse_fqs:
        scored = _apply_collapse(index, scored, cfq)
    if persist:
        scored = scored.persist()

    def _facet_base(ex_tags: set) -> DataFrame:
        """The scored set with filters whose tag is excluded left OUT.

        Collapse PostFilters carry no tag and always re-apply (Solr's
        CollapsingQParserPlugin stays a PostFilter during tag-excluded facet
        recomputation, so excluded-tag counts run over the COLLAPSED set)."""
        if not ex_tags:
            return scored
        base = _scored_set(index, q, now_epoch_ms)
        for tags, kind, df in applied_filters:
            if tags & ex_tags:
                continue
            how = "left_anti" if kind == "neg" else "left_semi"
            base = base.join(df, "docid", how)
        for cfq in collapse_fqs:
            base = _apply_collapse(index, base, cfq)
        return base

    # --- sort + window (start/rows) ---
    sort_spec = params.get("sort")
    order, needs = _parse_sort(sort_spec, now_epoch_ms=now_epoch_ms,
                           sort_missing=params.get("sortMissing"))
    needs_fields = [
        f
        for f in dict.fromkeys(needs)
        if f in stored.columns and f not in ("docid", "score")
    ]
    page = scored
    if needs_fields:
        page = page.join(stored.select("docid", *needs_fields), "docid")
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    # TakeOrderedAndProject bounds the head FIRST; the offset window then
    # ranks only those <= start+rows rows (offset paging; deep paging
    # belongs to cursorMark — bm25.search after=)
    head = page.orderBy(*order).limit(start + rows)
    w = Window.orderBy(*order)
    head = (
        head.withColumn("_ord", F.row_number().over(w))
        .where(F.col("_ord") > start)
        .select("docid", "score", "_ord")
    )

    # --- fl projection ---
    fl = params.get("fl")
    if fl:
        from lucene_solr_spark.search.returnfields import return_fields

        extra = [c for c in stored.columns if c != "docid"]
        enriched = head.join(stored.select("docid", *extra), "docid")
        if "[explain]" in fl:
            # ExplainAugmenterFactory: join a per-doc explanation string
            # built from the BM25 decomposition of the query's own terms
            # (DebugComponent -> SolrIndexSearcher.explain)
            from lucene_solr_spark.search.explain import explain_scores

            qs = q.strip()
            terms = (
                []
                if qs == "*:*" or qs.startswith("{!")
                else [t.lower() for t in _query_terms(parse_query(qs))]
            )
            if not terms:
                raise ValueError("[explain] needs a term query")
            exp = explain_scores(index, terms)
            line = F.format_string(
                "%s: score=%.4f (tf=%d df=%d idf=%.4f tfNorm=%.4f)",
                "term", "score", "tf", "df", "idf", "tf_norm",
            )
            exp_doc = (
                exp.withColumn("_line", line)
                .groupBy("docid")
                .agg(
                    F.concat_ws(
                        "; ", F.array_sort(F.collect_list("_line"))
                    ).alias("[explain]")
                )
            )
            enriched = enriched.join(exp_doc, "docid", "left")
        response = return_fields(
            enriched.orderBy("_ord").drop("_ord"), fl, now_epoch_ms=now_epoch_ms
        )
    else:
        response = head.orderBy("_ord").drop("_ord")
    page = head  # downstream consumers (highlighting) use the ranked page

    out: dict = {"response": response, "num_found": None}
    if params.get("numFound", True):
        out["num_found"] = scored.count()

    # --- facets over the FILTERED full set (FacetComponent) ---
    facet_fields = params.get("facet.field", []) or []
    if isinstance(facet_fields, str):
        facet_fields = [facet_fields]
    if facet_fields:
        from lucene_solr_spark.facets.facets import facet_field

        out["facet_fields"] = {}
        for spec in facet_fields:
            fname, ex, okey = spec, set(), None
            if spec.lstrip().startswith("{!"):
                _t, lp, fname = parse_local_params(spec)
                ex = {t for t in str(lp.get("ex", "")).split(",") if t}
                okey = lp.get("key")  # output key (QueryParsing 'key')
            base = _facet_base(ex).join(stored.select("docid", fname), "docid")
            out["facet_fields"][okey or fname] = facet_field(
                base, fname, limit=int(params.get("facet.limit", 20))
            )
    else:
        out["facet_fields"] = {}

    fquery = params.get("facet.query") or {}
    if fquery:
        rows_fc = []
        for label, fqstr in fquery.items():
            cnt = scored.join(
                _scored_set(index, fqstr, now_epoch_ms).select("docid"),
                "docid",
                "left_semi",
            ).count()
            rows_fc.append((label, cnt))
        spark = SparkSession.getActiveSession()
        out["facet_queries"] = spark.createDataFrame(
            rows_fc, "facet_query string, facet_count long"
        )
    else:
        out["facet_queries"] = None

    # --- highlighting of the result page (HighlightComponent) ---
    if str(params.get("hl", "")).lower() in ("true", "on", "1"):
        from lucene_solr_spark.search.highlight import highlight_fragment_multi

        qs = q.strip()
        terms = (
            []
            if qs == "*:*" or qs.startswith("{!")
            else [t.lower() for t in _query_terms(parse_query(qs))]
        )
        if not terms:
            raise ValueError("hl needs a term query (hl over {!..}/*:* unsupported)")
        if "text" not in stored.columns:
            raise ValueError(
                "hl needs a stored-fields frame carrying (docid, text) — "
                "pass select(..., stored=documents_frame)"
            )
        snip = highlight_fragment_multi(F.col("text"), terms)
        out["highlighting"] = (
            stored.select("docid", "text")
            .join(F.broadcast(page.select("docid", "score")), "docid")
            .select("docid", snip.alias("snippet"))
        )
    else:
        out["highlighting"] = None

    # --- grouping (group.field) ---
    gfield = params.get("group.field")
    if gfield:
        from lucene_solr_spark.facets.facets import group_topk

        glimit = int(params.get("group.limit", 1))
        base = scored.join(stored.select("docid", gfield), "docid")
        out["grouped"] = group_topk(
            base, gfield, [F.col("score").desc(), F.col("docid").asc()], k=glimit
        )
    else:
        out["grouped"] = None

    return out


_EXPORT_TYPES = ("int", "bigint", "float", "double", "string")


def export(
    index: IndexTables,
    params: dict,
    stored: DataFrame | None = None,
    now_epoch_ms: int | None = None,
) -> DataFrame:
    """The /export handler: rq={!xport} + wt=xsort — the FULL sorted result
    set, streamed (no rows window, no scoring).

    Reference: ExportQParserPlugin.java (the {!xport} RankQuery marks every
    hit in per-segment FixedBitSets) + SortingResponseWriter.java:72-192
    (re-sorts and emits the set in 30,000-doc partial-sort batches because
    one node cannot hold the full sort).  Contract enforced identically:
    sort is required (:81-89), scoring is unsupported (:92-93,114-115), fl
    is required (:105-108), and export fields must be docvalues-backed
    int/float/long/double/string (:262).

    Spark-first: the hand-rolled batch machinery IS Spark's distributed
    sort — range-partitioned Tungsten external sort over the matched set,
    each partition streaming to the sink; no 30k queue, no driver
    materialization.  Returns the sorted DataFrame (docid tie-break last,
    HitQueue discipline)."""
    q = params.get("q", "*:*")
    stored = stored if stored is not None else index.docs

    sort_spec = params.get("sort")
    if not sort_spec:
        raise ValueError("No sort criteria was provided.")
    if "score" in [n for n, _ in _split_sort(sort_spec)]:
        raise ValueError("Scoring is not currently supported with xsort.")

    fl = params.get("fl")
    if not fl:
        raise ValueError("export field list (fl) must be specified.")
    fields = [f.strip() for f in str(fl).split(",") if f.strip()]
    if "score" in fields:
        raise ValueError("Scoring is not currently supported with xsort.")
    typed = dict(stored.dtypes)
    for f in fields:
        if f == "docid":
            continue
        if f not in typed:
            raise ValueError(f"export field {f!r} is not a stored field")
        if typed[f] not in _EXPORT_TYPES:
            raise ValueError(
                "Export fields must either be one of the following types: "
                f"int,float,long,double,string (got {f}:{typed[f]})"
            )

    matched = _scored_set(index, q, now_epoch_ms).select("docid")
    fqs = params.get("fq", []) or []
    if isinstance(fqs, str):
        fqs = [fqs]
    if fqs:
        from lucene_solr_spark.search.filtercache import _parse_filter

        for fq in fqs:
            kind, df = _parse_filter(index, fq, now_epoch_ms=now_epoch_ms)
            how = "left_anti" if kind == "neg" else "left_semi"
            matched = matched.join(df, "docid", how)

    order, needs = _parse_sort(sort_spec, now_epoch_ms=now_epoch_ms,
                           sort_missing=params.get("sortMissing"))
    need_cols = [
        c
        for c in dict.fromkeys(list(needs) + [f for f in fields if f != "docid"])
        if c in stored.columns and c != "docid"
    ]
    full = matched.join(stored.select("docid", *need_cols), "docid")
    return full.orderBy(*order).select(*(["docid"] + [f for f in fields if f != "docid"]))
