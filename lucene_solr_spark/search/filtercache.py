"""FilterCache + processed-filter intersection: cached fq DocSets.

Reference: SolrIndexSearcher keeps filter-query DocSets in the filterCache
(solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:149-152,
FastLRUCache.java) and ``getProcessedFilter`` (:1004-1084) combines several
fq sets: positives intersect starting from the SMALLEST set (:1054-1062
tracks smallestIndex/smallestCount), pure-negative filters apply as
complements AFTER the positive intersection (:1030-1050 splits
positive/negative, negatives andNot at the end).

Spark shape: a DocSet is a persisted docid frame — Spark's in-memory
columnar cache is the bitset analog; persist handles are held in the LRU map
so eviction unpersists the exact cached frame.  Intersection is a chain of
``left_semi`` joins anchored on the smallest set (so every join's probe side
is already the current intersection — never larger than the smallest fq),
negatives are ``left_anti`` joins.  Everything stays distributed; the only
driver-side state is the LRU bookkeeping and the materialized set sizes,
which the reference also tracks (DocSet.size())."""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables


def _local_params_docset(
    index: IndexTables, fq: str, now_epoch_ms: int | None = None
) -> DataFrame:
    """Unlimited DocSet for a ``{!type ...}`` filter query — fq accepts any
    qparser in Solr (QParser.getParser runs for each fq,
    SolrIndexSearcher.getProcessedFilter consumes the DocSets).  Supported
    here: the set-producing parsers (term/terms/prefix on docvalues or the
    indexed terms, frange on a compiled function)."""
    from lucene_solr_spark.search.qparsers import (
        _match_docset_for_string,
        _resolve_field,
        parse_local_params,
    )

    qtype, params, body = parse_local_params(fq)
    if qtype == "lucene":
        return _match_docset_for_string(index, body)
    if qtype in ("term", "terms", "prefix"):
        f = _resolve_field(index, params.get("f"))
        if qtype == "terms":
            sep = params.get("separator", ",")
            vals = [v.strip() for v in body.split(sep) if v.strip()]
            if f is not None:
                return index.docs.filter(
                    F.col(f).cast("string").isin(vals)
                ).select("docid")
            return (
                index.postings.filter(F.col("term").isin(vals))
                .select("docid")
                .distinct()
            )
        if qtype == "term":
            if f is not None:
                return index.docs.filter(
                    F.col(f).cast("string") == body
                ).select("docid")
            return (
                index.postings.filter(F.col("term") == body)
                .select("docid")
                .distinct()
            )
        # prefix
        if f is not None:
            return index.docs.filter(
                F.col(f).cast("string").startswith(body)
            ).select("docid")
        from lucene_solr_spark.search.bm25 import _matched_docset
        from lucene_solr_spark.search.query import PrefixQuery

        return _matched_docset(index, PrefixQuery(body))
    if qtype == "frange":
        from lucene_solr_spark.functions import parse_function_query

        # same pinned-NOW contract as the q-side _frange_qparser: a filter
        # like {!frange l=0}ms(NOW,ts) needs the per-request NOW
        col = parse_function_query(body, now_epoch_ms=now_epoch_ms)
        cond = F.lit(True)
        if "l" in params:
            lo = float(params["l"])
            incl = params.get("incl", "true").lower() != "false"
            cond = cond & (col >= lo if incl else col > lo)
        if "u" in params:
            hi = float(params["u"])
            incu = params.get("incu", "true").lower() != "false"
            cond = cond & (col <= hi if incu else col < hi)
        return index.docs.filter(cond).select("docid")
    if qtype in ("geofilt", "bbox"):
        # SpatialFilterQParser as an fq (the common Solr usage:
        # fq={!geofilt sfield=loc pt=.. d=..})
        from lucene_solr_spark.search.spatial import bbox_docset, geofilt_docset

        sfield = params["sfield"]
        if f"{sfield}_0_coordinate" not in index.docs.columns:
            raise ValueError(f"undefined spatial field: {sfield!r}")
        fn = bbox_docset if qtype == "bbox" else geofilt_docset
        return fn(index.docs, sfield, params["pt"], float(params["d"]))
    raise ValueError(f"unsupported filter qparser: {qtype!r}")


def _peel_cache_params(fq: str) -> tuple[str, bool]:
    """Strip ``cache=``/``cost=`` from a leading local-params block
    (SolrIndexSearcher honours {!cache=false} by recomputing the DocSet per
    request; ``cost`` orders non-cached filters — here the smallest-first
    intersection already orders CACHED sets by exact size, and non-cached
    sets apply last, which is Solr's post-filter position).  Returns the
    cleaned fq and whether caching is enabled (default True)."""
    import re as _re

    m = _re.match(r"^\s*\{!([^}]*)\}", fq)
    if not m:
        return fq, True
    body = m.group(1)
    parts = [p for p in body.split() if p]
    kept, cache = [], True
    for p in parts:
        if p.startswith("cache="):
            cache = p.split("=", 1)[1].strip().lower() != "false"
        elif p.startswith("cost="):
            continue  # ordering hint only; see docstring
        else:
            kept.append(p)
    rest = fq[m.end():]
    if kept:
        return "{!" + " ".join(kept) + "}" + rest, cache
    return rest, cache


def _parse_filter(index: IndexTables, fq: str, now_epoch_ms: int | None = None):
    """-> ("pos", docset_df) or ("neg", matches_df).  A pure-negative fq
    (e.g. ``-slow``) means "all docs except matches" (:1030-1050); a
    ``{!type}`` local-params fq routes through its qparser's DocSet."""
    from lucene_solr_spark.search.parser import CompositeQuery, parse_query
    from lucene_solr_spark.search.qparsers import _match_docset_for_string
    from lucene_solr_spark.search.query import BooleanQuery

    if fq.lstrip().startswith("{!"):
        return "pos", _local_params_docset(index, fq, now_epoch_ms=now_epoch_ms)

    parsed = parse_query(fq)
    if (
        isinstance(parsed, BooleanQuery)
        and parsed.must_not
        and not (parsed.must or parsed.should)
    ):
        from lucene_solr_spark.search.bm25 import any_term_docset

        return "neg", any_term_docset(index, [t.term for t in parsed.must_not])
    if isinstance(parsed, CompositeQuery):
        raise ValueError("filter queries support term/boolean/multi-term bodies")
    return "pos", _match_docset_for_string(index, fq)


class FilterCache:
    """LRU filterCache over canonical fq strings -> persisted DocSet frames.

    ``max_size`` caps live entries (FastLRUCache size); eviction unpersists
    the evicted frame.  ``stats()`` mirrors the cache's lookups/hits/
    evictions counters (SolrCache.getStatistics analog)."""

    def __init__(self, index: IndexTables, max_size: int = 64):
        self.index = index
        self.max_size = int(max_size)
        # fq -> (kind, persisted_df, size)
        self._entries: OrderedDict[str, tuple[str, DataFrame, int]] = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def _lookup(
        self, fq: str, now_epoch_ms: int | None = None
    ) -> tuple[str, DataFrame, int]:
        # NOW participates in the key: the same frange fq pinned to two
        # different request-NOWs is two different DocSets (Solr keys the
        # filterCache on the Query object, which embeds the resolved NOW)
        fq, cacheable = _peel_cache_params(fq)
        if not cacheable:
            # {!cache=false}: recompute per request, never persisted; the
            # sentinel size sorts it AFTER every cached set — Solr's
            # non-cached filters likewise apply at the post-filter position
            kind, df = _parse_filter(self.index, fq, now_epoch_ms=now_epoch_ms)
            return (kind, df, 1 << 62)
        key = (fq, now_epoch_ms)
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        kind, df = _parse_filter(self.index, fq, now_epoch_ms=now_epoch_ms)
        df = df.persist()
        size = df.count()  # materializes the cache entry; DocSet.size()
        self._entries[key] = (kind, df, size)
        while len(self._entries) > self.max_size:
            _, (_, old, _) = self._entries.popitem(last=False)
            old.unpersist()
            self.evictions += 1
        return self._entries[key]

    def docset(self, fq: str, now_epoch_ms: int | None = None) -> DataFrame:
        """The cached DocSet for one POSITIVE fq (getDocSet with cache)."""
        kind, df, _ = self._lookup(fq, now_epoch_ms=now_epoch_ms)
        if kind != "pos":
            raise ValueError(f"pure-negative fq has no standalone DocSet: {fq!r}")
        return df

    def filtered(
        self, fqs: list[str], now_epoch_ms: int | None = None
    ) -> DataFrame:
        """getProcessedFilter (:1004-1084): intersect the positive fq sets
        smallest-first, then apply pure-negative fqs as complements.  A
        negative-only list complements against the whole doc table."""
        if not fqs:
            raise ValueError("filtered needs >= 1 fq")
        entries = [
            (fq, *self._lookup(fq, now_epoch_ms=now_epoch_ms)) for fq in fqs
        ]
        pos = sorted(
            (e for e in entries if e[1] == "pos"), key=lambda e: (e[3], e[0])
        )
        negs = [e for e in entries if e[1] == "neg"]
        if pos:
            answer = pos[0][2]
            for _, _, df, _ in pos[1:]:
                answer = answer.join(df, "docid", "left_semi")
        else:
            answer = self.index.docs.select("docid")
        for _, _, df, _ in negs:
            answer = answer.join(df, "docid", "left_anti")
        return answer

    def stats(self) -> dict:
        return {
            "lookups": self.hits + self.misses,
            "hits": self.hits,
            "misses": self.misses,
            "evictions": self.evictions,
            "size": len(self._entries),
        }

    def clear(self) -> None:
        for _, df, _ in self._entries.values():
            df.unpersist()
        self._entries.clear()


def search_filtered(
    index: IndexTables,
    q,
    fqs: list[str],
    cache: "FilterCache | None" = None,
    k: int = 10,
    round_dp: int = 4,
    now_epoch_ms: int | None = None,
) -> DataFrame:
    """q + fq composition (SolrIndexSearcher.getDocListNC:1555 via
    getProcessedFilter): the MAIN query scores; the processed filter
    intersects the scored set WITHOUT contributing to scores; top-k applies
    AFTER filtering (a filtered-out doc never displaces a hit).

    ``q`` is a query string (classic grammar) or a BooleanQuery of term
    clauses; ``fqs`` are filter-query strings (term/boolean/multi-term, plus
    pure-negative forms)."""
    from lucene_solr_spark.search.bm25 import _boolean_topk
    from lucene_solr_spark.search.parser import CompositeQuery, parse_query
    from lucene_solr_spark.search.query import BooleanQuery, TermQuery

    if isinstance(q, str):
        q = parse_query(q)
    if isinstance(q, TermQuery):
        q = BooleanQuery(should=(q,))
    if isinstance(q, CompositeQuery) or not isinstance(q, BooleanQuery):
        raise ValueError("search_filtered supports term-boolean main queries")
    scored = _boolean_topk(index, q, k, round_dp)  # unlimited scored set
    # {!collapse} is a PostFilter (CollapsingQParserPlugin.java:60-120
    # implements PostFilter, cost >= 100): it transforms the SCORED result
    # set after the DocSet filters, never producing a DocSet itself.
    collapse_fqs = [f for f in fqs if f.lstrip().startswith("{!collapse")]
    fqs = [f for f in fqs if f not in collapse_fqs]
    if cache is not None:
        filt = (
            cache.filtered(fqs, now_epoch_ms=now_epoch_ms)
            if fqs
            else index.docs.select("docid")
        )
    else:
        # one-shot: build the processed filter lazily — no persist/count
        # jobs, no cache bookkeeping (smallest-first needs sizes, which only
        # the cache tracks; AQE reorders uncached joins at runtime)
        if not fqs and not collapse_fqs:
            raise ValueError("search_filtered needs >= 1 fq")
        filt = None
        negs = []
        for fq in fqs:
            kind, df = _parse_filter(index, fq, now_epoch_ms=now_epoch_ms)
            if kind == "neg":
                negs.append(df)
            else:
                filt = df if filt is None else filt.join(df, "docid", "left_semi")
        if filt is None:
            filt = index.docs.select("docid")
        for df in negs:
            filt = filt.join(df, "docid", "left_anti")
    out = scored.join(filt, "docid", "left_semi")
    for cfq in collapse_fqs:
        out = _apply_collapse(index, out, cfq)
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


def _apply_collapse(index: IndexTables, scored: DataFrame, fq: str) -> DataFrame:
    """fq={!collapse field=... [min=|max=numfield] [nullPolicy=...]}
    (CollapsingQParserPlugin): keep one doc per group value — highest score
    (docid-asc tie-break) by default, or the group's min/max of a numeric
    docvalues field.  nullPolicy (CollapsingQParserPlugin.java NULL_IGNORE/
    NULL_EXPAND/NULL_COLLAPSE): ``ignore`` drops null-group docs (default),
    ``expand`` passes every null-group doc through uncollapsed,
    ``collapse`` folds all nulls into one group.  One window pass over the
    already-scored set."""
    from lucene_solr_spark.facets.facets import collapse
    from lucene_solr_spark.search.qparsers import parse_local_params

    qtype, params, _body = parse_local_params(fq)
    assert qtype == "collapse"
    field = params.get("field")
    if field is None or field not in index.docs.columns:
        raise ValueError(f"collapse needs a docvalues field, got {field!r}")
    nullp = params.get("nullPolicy", "ignore")
    if nullp not in ("ignore", "expand", "collapse"):
        raise ValueError(f"unknown nullPolicy: {nullp!r}")
    sel_min, sel_max = params.get("min"), params.get("max")
    withg = scored.join(index.docs.select("docid", field), "docid")
    nulls = withg.filter(F.col(field).isNull())
    if nullp != "collapse":
        withg = withg.filter(F.col(field).isNotNull())
    drop_cols = [field]
    if sel_min or sel_max:
        sel = sel_min or sel_max
        if sel in index.docs.columns:
            withg = withg.join(index.docs.select("docid", sel), "docid")
            sel_col = F.col(sel)
            drop_cols.append(sel)
        else:
            # function selector (CollapsingQParserPlugin FUNC_VALUE_SOURCE
            # group head), e.g. max=cscore() or max=sub(field(y),score):
            # compile through the function registry; cscore() reads the
            # collapse frame's own score column
            import re as _re

            from lucene_solr_spark.functions import parse_function_query

            needed = [
                f
                for f in dict.fromkeys(
                    _re.findall(r"[A-Za-z_][A-Za-z0-9_]*", sel)
                )
                if f in index.docs.columns and f not in withg.columns
            ]
            if needed:
                withg = withg.join(
                    index.docs.select("docid", *needed), "docid"
                )
            withg = withg.withColumn(
                "__csel__", parse_function_query(sel, index=index)
            )
            sel_col = F.col("__csel__")
            drop_cols.extend(["__csel__", *needed])
        order = [
            sel_col.asc() if sel_min else sel_col.desc(),
            F.col("docid").asc(),
        ]
    else:
        order = [F.col("score").desc(), F.col("docid").asc()]
    out = collapse(withg, field, order).drop(*drop_cols)
    if nullp == "expand":
        out = out.unionByName(nulls.drop(field))
    return out


# ---------------------------------------------------------------------------
# lucene/queries filter set — TermsFilter, BooleanFilter, ChainedFilter
# (reference: lucene/queries/src/java/org/apache/lucene/queries/
# TermsFilter.java, BooleanFilter.java:55-100, ChainedFilter.java:129-207).
# DocSets are docid frames; union/intersect/subtract are distributed set
# joins, complement goes through the docs table (the maxDoc universe).
# Scale shape: each combinator is one join/union over docid-only frames —
# column-pruned, broadcastable when selective, no driver materialization.
# ---------------------------------------------------------------------------


def terms_filter(index: IndexTables, terms: list[str]) -> DataFrame:
    """TermsFilter: the constant-score DocSet of docs containing ANY of the
    terms (TermsFilter.java — one dictionary seek per term, bits OR'd)."""
    return (
        index.postings.filter(F.col("term").isin(list(terms)))
        .select("docid").distinct()
    )


def _all_docids(index: IndexTables) -> DataFrame:
    return index.docs.select("docid")


def _union(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionAll(b).distinct()


def _xor(a: DataFrame, b: DataFrame) -> DataFrame:
    return _union(
        a.join(b, "docid", "left_anti"), b.join(a, "docid", "left_anti")
    )


def boolean_filter(
    index: IndexTables,
    must: list[DataFrame] = (),
    should: list[DataFrame] = (),
    must_not: list[DataFrame] = (),
) -> DataFrame:
    """BooleanFilter (BooleanFilter.java:55-100): SHOULD sets OR together,
    MUST_NOT sets subtract (from the full maxDoc universe when there were
    no SHOULD clauses), MUST sets intersect last."""
    res = None
    for s in should:
        res = s if res is None else _union(res, s)
    if must_not:
        if res is None:
            res = _all_docids(index)
        for n in must_not:
            res = res.join(n, "docid", "left_anti")
    for m in must:
        res = m if res is None else res.join(m, "docid", "left_semi")
    if res is None:
        raise ValueError("BooleanFilter needs at least one clause")
    return res.select("docid")


def chained_filter(
    index: IndexTables,
    chain: list[DataFrame],
    logic: str | list[str] = "or",
) -> DataFrame:
    """ChainedFilter (ChainedFilter.java:129-207): sequentially fold the
    chain with per-link ops.  ``logic`` is one op for every link or a list
    the chain's length; the FIRST link initializes the result — its own set
    for AND, its complement for ANDNOT, folded into the empty set for
    OR/XOR (initialResult :129-142)."""
    if not chain:
        raise ValueError("ChainedFilter needs at least one filter")
    ops = [logic] * len(chain) if isinstance(logic, str) else list(logic)
    if len(ops) != len(chain):
        raise ValueError("logic list must match chain length")
    first, start = ops[0].lower(), 0
    if first == "and":
        res = chain[0].select("docid")
        start = 1
    elif first == "andnot":
        res = _all_docids(index).join(chain[0], "docid", "left_anti")
        start = 1
    else:
        res = None  # empty set
    for i in range(start, len(chain)):
        op, f = ops[i].lower(), chain[i].select("docid")
        if res is None:
            # folding into the empty set: OR/XOR yield f, AND empty, ANDNOT empty
            res = f if op in ("or", "xor") else f.limit(0)
            continue
        if op == "or":
            res = _union(res, f)
        elif op == "and":
            res = res.join(f, "docid", "left_semi")
        elif op == "andnot":
            res = res.join(f, "docid", "left_anti")
        elif op == "xor":
            res = _xor(res, f)
        else:
            raise ValueError(f"unknown chain op {op!r}")
    return res.select("docid")


def duplicate_filter(
    values: DataFrame, keep_mode: str = "last"
) -> DataFrame:
    """DuplicateFilter (lucene/sandbox/.../sandbox/queries/DuplicateFilter.
    java:47-170): for every unique value of the key field keep only the
    FIRST or LAST occurrence by docid (KM_USE_FIRST_OCCURRENCE /
    KM_USE_LAST_OCCURRENCE; the two processing modes differ only in how
    deletions invalidate bits — identical result on a live-docs frame).

    ``values`` is a (docid, keyval) frame; the result is the surviving
    DocSet.  One hash aggregate — the same shape as exact dedup's
    canonical-survivor groupBy."""
    agg = F.min("docid") if keep_mode == "first" else F.max("docid")
    return values.groupBy("keyval").agg(agg.alias("docid")).select("docid")
