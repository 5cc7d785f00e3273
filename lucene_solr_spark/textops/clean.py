"""Web-corpus cleaning operators: URL canonicalization, PII redaction,
within-document line dedup.

These are the pre-training cleanup passes public pipelines describe —
C4 (Raffel et al. 2020, §2.2: deduplicate three-sentence spans, discard
pages with placeholder text) and Gopher/MassiveText (Rae et al. 2021,
Appendix A: repetition filters, document dedup by URL and content).  All
pure Catalyst — codegen'd string/array expressions, no Python, embarrassingly
parallel (per-row maps plus one hash-aggregate for the URL dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query params that never change page content (tracking/session noise) —
# the canonicalization drop-list
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "sessionid",
)
# deliberately NOT stripped: generic params like ``ref`` often select content
# (repo branches, storefront referrer-products) — stripping them would
# wrongfully merge distinct documents


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for dedup keys:

    * scheme + host lowercased; ``www.`` prefix dropped;
    * fragment (``#...``) dropped;
    * tracking query params dropped (TRACKING_PARAMS), ``?`` dropped when
      no params survive;
    * trailing ``/`` dropped (except a bare host root).

    One codegen expression chain — regex surgery, no URL library."""
    c = url
    # split off and drop the fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # lowercase scheme+host (up to the first '/' after '://')
    head = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    c = F.concat(F.lower(head), c.substr(F.length(head) + 1, F.lit(1 << 30)))
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    # drop tracking params (with their values), then tidy separators
    for p in TRACKING_PARAMS:
        c = F.regexp_replace(c, r"([?&])" + p + r"=[^&#]*", "$1")
    c = F.regexp_replace(c, r"&&+", "&")  # a&utm=x&b -> a&&b -> a&b
    c = F.regexp_replace(c, r"\?&+", "?")  # ?utm=x&a -> ?&a -> ?a
    c = F.regexp_replace(c, r"[?&]+$", "")  # ?utm=x -> ? -> (gone)
    # slash before the query, and trailing slash (keep the bare host root)
    c = F.regexp_replace(c, r"/+\?", "?")
    c = F.regexp_replace(c, r"(://[^/?]+/.+?)/+$", "$1")
    # normalize the root form: 'scheme://host' and 'scheme://host/' (and the
    # ?-query variants) must share one key — the slashed form is canonical
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/?]+)$", "$1/")
    c = F.regexp_replace(c, r"^([a-z][a-z0-9+.-]*://[^/?]+)\?", "$1/?")
    return c


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", key_col: str = "doc_id"
) -> DataFrame:
    """One survivor per canonical URL (re-crawl/tracking-variant dedup —
    MassiveText dedups by URL before content): deterministic min-key
    survivor, same shape as the exact content dedup (hash-groupBy with
    map-side combine)."""
    canon = df.withColumn("_curl", canonical_url(F.col(url_col)))
    keep = canon.groupBy("_curl").agg(F.min(key_col).alias(key_col))
    return canon.join(keep, ["_curl", key_col], "left_semi").drop("_curl")


# domain may be a name OR an IPv4 literal (jo@10.0.0.1 must redact WHOLE,
# not leave the identifying local part behind an <IP> token)
_EMAIL = (
    r"[A-Za-z0-9._%+-]+@(?:[A-Za-z0-9.-]+\.[A-Za-z]{2,}|(?:\d{1,3}\.){3}\d{1,3})"
)
# separated groups OR a bare 10-digit run
_PHONE = r"(?:(?:\+?\d{1,3}[-. (]{1,2})?\d{3}[-. )]{1,2}\d{3}[-. ]\d{4}|\b\d{10}\b)"
_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
    ip_token: str = "<IP>",
) -> DataFrame:
    """Mask emails, phone-number shapes, and IPv4 literals with placeholder
    tokens (the pre-training PII scrub every public pipeline applies before
    release).  Pure regexp_replace chain; order matters (emails first so
    their digits never half-match the phone pattern)."""
    c = F.col(text_col)
    c = F.regexp_replace(c, _EMAIL, email_token)
    c = F.regexp_replace(c, _IPV4, ip_token)
    c = F.regexp_replace(c, _PHONE, phone_token)
    return df.withColumn(out or text_col, c)


def dedup_lines_within_doc(
    df: DataFrame, text_col: str = "text", out: str | None = None
) -> DataFrame:
    """Drop EXACT repeated lines within each document, keeping first
    occurrences in order (the C4 three-sentence-span dedup simplified to
    line granularity; Gopher's repetition filters measure the same signal).

    Catalyst-only: split -> positional explode is avoided by a higher-order
    filter — a line survives if its index equals the index of its first
    occurrence (array_position on the materialized array; splitting inside
    the lambda would re-split the whole text per element)."""
    split_once = df.withColumn("_lines", F.split(F.col(text_col), "\n"))
    kept = F.filter(
        F.col("_lines"),
        lambda x, i: F.array_position(F.col("_lines"), x) == i + F.lit(1),
    )
    return split_once.withColumn(out or text_col, F.array_join(kept, "\n")).drop(
        "_lines"
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
    out: str | None = None,
) -> DataFrame:
    """Corpus-level boilerplate removal: a line appearing in >= ``min_docs``
    DISTINCT documents (headers/footers/nav chrome) is stripped from every
    document (the CCNet/RefinedWeb de-boilerplating signal: cross-document
    line frequency).

    Shape: one explode + hash-aggregate finds the boilerplate set — tiny by
    construction (only lines crossing the threshold) — which broadcasts into
    an anti-join against the positionally-exploded lines; surviving lines
    re-assemble in order.  Two shuffles total (the line-df aggregate and the
    per-doc re-aggregation), both on uniformly-hashed keys."""
    nl = "\n"
    lines = F.split(F.col(text_col), nl)
    exploded = df.select(
        F.col(id_col), F.posexplode(lines).alias("_i", "_line")
    )
    bp = (
        exploded.select(id_col, "_line")
        .distinct()
        .groupBy("_line")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_line")
    )
    kept = exploded.join(F.broadcast(bp), "_line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_line"))),
                lambda s: s["_line"],
            ),
            nl,
        ).alias(out or text_col)
    )
    keep_cols = [c for c in df.columns if c != (out or text_col)]
    return df.select(*keep_cols).join(rebuilt, id_col, "left").fillna(
        {out or text_col: ""}
    )


def extract_domain(url: Column) -> Column:
    """Registrable host of a URL, lowercased, ``www.`` stripped — the key a
    domain blocklist matches on (one codegen regex chain)."""
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1))
    return F.regexp_replace(host, r"^www\.", "")


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    mode: str = "drop",
) -> DataFrame:
    """Domain blocklist filter — the standard web-corpus curation gate
    (the UT1/StopForumSpam-style blocklists every published pipeline
    applies; e.g. RefinedWeb §3.1, public method).

    ``blocklist`` is a one-column ``domain`` frame.  A doc is blocked when
    its URL's registrable host equals a listed domain OR is a subdomain of
    one.  ``mode='drop'`` keeps the clean docs; ``mode='flag'`` returns
    every doc with a ``blocked`` column.

    Scale shape: blocklists are small (10^4-10^6 rows) — the host's
    label-boundary suffix chain (``a.b.c.com -> [a.b.c.com, b.c.com,
    c.com, com]``, bounded by the ~5-label host depth) is exploded and
    EQUI-joined against the broadcast blocklist, a BroadcastHashJoin.  An
    OR-of-equality-and-endswith condition would instead plan a
    BroadcastNestedLoopJoin = O(corpus x blocklist) string comparisons —
    the suffix explode buys the hash path for one cheap bounded explode."""
    bl = F.broadcast(blocklist.select(F.lower(F.col("domain")).alias("domain")).distinct())
    withd = df.withColumn("_dom", extract_domain(F.col(url_col)))
    # exact match OR subdomain match with a '.domain' label boundary (so
    # evil.com never blocks notevil.com): exactly the label-boundary
    # suffixes of the host, equi-joined.
    suffixes = F.expr(
        "transform(sequence(1, size(split(_dom, '[.]'))),"
        " i -> array_join(slice(split(_dom, '[.]'),"
        " i, size(split(_dom, '[.]')) - i + 1), '.'))"
    )
    hit = withd.select(
        *df.columns, "_dom", F.explode(suffixes).alias("_sfx")
    ).join(bl, F.col("_sfx") == F.col("domain"), "left")
    # a doc may match several blocklist rows; collapse to one verdict
    key_cols = [c for c in df.columns]
    flagged = (
        hit.groupBy(*[F.col(c) for c in key_cols], "_dom")
        .agg(F.max(F.col("domain").isNotNull().cast("int")).alias("_b"))
        .withColumn("blocked", F.col("_b") == 1)
        .drop("_b", "_dom")
    )
    if mode == "flag":
        return flagged
    if mode == "drop":
        return flagged.where(~F.col("blocked")).drop("blocked")
    raise ValueError(f"unknown mode {mode!r}")


def curation_pipeline(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    blocklist: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    min_overlap: int = 3,
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """The composed training-data curation pass — one verdict per doc with
    the FIRST failing stage as the reason, in the order every published
    pipeline applies them (cheap gates first):

        blocked_domain -> url_duplicate -> exact_duplicate -> gopher_fail
        -> contaminated -> keep

    Stages are the engine's existing operators (filter_blocked_domains,
    dedup_by_canonical_url survivors, exact_dup_groups canonicals,
    filters.gopher_filter, dedup.decontaminate); each contributes one
    boolean column via a docid-keyed join, and the verdict is a single
    fixed-order CASE.  Optional stages (no blocklist / no url column / no
    benchmark) drop out of the plan entirely.

    Scale shape: every stage is an audited shape (broadcast joins, hash
    aggregates); composing them adds joins on docid only — at 100 TB this
    is the run-once curation job, checkpointed per stage like the store
    build."""
    from lucene_solr_spark.textops.dedup import (
        _widen_scan,
        decontaminate,
        exact_dup_groups,
    )
    from lucene_solr_spark.textops.filters import gopher_filter

    # widen the probe side like the dedup scans: the verdict joins cascade
    # off this frame, and an under-split source pins the whole final stage
    # to 1-2 tasks
    docs = _widen_scan(docs)
    out = docs.select(F.col(id_col).cast("long").alias("docid"))

    conds = []  # (reason, boolean column name) in gate order
    if blocklist is not None and url_col is not None:
        bd = (
            filter_blocked_domains(
                docs.select(F.col(id_col).cast("long").alias("docid"), url_col),
                blocklist, url_col=url_col, mode="flag",
            ).select("docid", F.col("blocked").alias("_blocked"))
        )
        out = out.join(bd, "docid", "left")
        conds.append(("blocked_domain", "_blocked"))
    if url_col is not None:
        surv = dedup_by_canonical_url(
            docs.select(F.col(id_col).cast("long").alias(id_col), url_col),
            url_col=url_col, key_col=id_col,
        ).select(F.col(id_col).alias("docid"), F.lit(1).alias("_usurv"))
        out = out.join(surv, "docid", "left").withColumn(
            "_urldup", F.col("_usurv").isNull()
        )
        conds.append(("url_duplicate", "_urldup"))
    # exact content dedup: non-canonical members of dup groups drop
    groups = exact_dup_groups(docs, id_col=id_col, text_col=text_col)
    chash = docs.select(
        F.col(id_col).cast("long").alias("docid"),
        F.md5(F.col(text_col).cast("binary")).alias("chash"),
    )
    dropped = (
        chash.join(groups, "chash")
        .where(F.col("docid") != F.col("canonical_id"))
        .select("docid", F.lit(1).alias("_xdup"))
    )
    out = out.join(dropped, "docid", "left").withColumn(
        "_exactdup", F.col("_xdup").isNotNull()
    )
    conds.append(("exact_duplicate", "_exactdup"))
    g = gopher_filter(docs, id_col=id_col, text_col=text_col, **(gopher_kwargs or {}))
    out = out.join(
        g.select("docid", (~F.col("keep")).alias("_gfail")), "docid", "left"
    )
    conds.append(("gopher_fail", "_gfail"))
    if benchmark is not None:
        dc = decontaminate(
            docs, benchmark, min_overlap=min_overlap,
            id_col=id_col, text_col=text_col,
        ).select("docid", F.col("contaminated").alias("_contam"))
        out = out.join(dc, "docid", "left")
        conds.append(("contaminated", "_contam"))

    reason = F.lit("keep")
    for name, col in reversed(conds):
        reason = F.when(F.coalesce(F.col(col), F.lit(False)), F.lit(name)).otherwise(reason)
    return out.select(
        "docid",
        (reason == F.lit("keep")).alias("keep"),
        reason.alias("reason"),
    )
