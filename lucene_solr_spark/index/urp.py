"""UpdateRequestProcessor chain: pre-index document transforms.

Reference: solr/core/src/java/org/apache/solr/update/processor/ — an URP
chain mutates each SolrInputDocument before it reaches the index.  The Spark
analog is a composition of DataFrame -> DataFrame functions applied to the
document frame before ``build_index`` / the store write; every processor
below is pure Catalyst (runs inside whole-stage codegen, nothing per-row in
Python) and maps 1:1 onto a reference factory:

==========================  ==================================================
processor                   reference factory
==========================  ==================================================
signature                   SignatureUpdateProcessorFactory.java:49-120 +
                            MD5Signature.java:28-45 (exact-duplicate
                            signature over concatenated source fields)
dedupe                      the factory's overwriteDupes=true effect: one
                            survivor per signature (deterministic: the
                            MIN-keyed doc, since a batch has no arrival order)
html_strip                  HTMLStripFieldUpdateProcessorFactory.java:30-42
default_value               DefaultValueUpdateProcessorFactory.java:38-52
trim_field                  TrimFieldUpdateProcessorFactory.java:30-40
regex_replace               RegexReplaceProcessorFactory.java:45-75
clone_field                 CloneFieldUpdateProcessorFactory.java:70-95
field_length                FieldLengthUpdateProcessorFactory.java:30-45
chain                       UpdateRequestProcessorChain.java:40-60 (ordered
                            composition)
==========================  ==================================================

Near-duplicate signatures (TextProfileSignature's quantized token profile)
are served by the first-class textops dedup operators (MinHash/SimHash —
SURVEY §8.2), which scale past what a per-doc profile hash gives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def signature(
    df: DataFrame, fields: list[str], out: str = "signature"
) -> DataFrame:
    """MD5 signature over the concatenated source fields (null -> empty,
    fields in the given order — SignatureUpdateProcessorFactory reads
    ``fields`` in config order)."""
    cat = F.concat(*[F.coalesce(F.col(f).cast("string"), F.lit("")) for f in fields])
    return df.withColumn(out, F.md5(cat.cast("binary")))


def dedupe(df: DataFrame, key_col: str, sig_col: str = "signature") -> DataFrame:
    """One survivor per signature: the minimum-keyed doc.  (Solr's
    overwriteDupes keeps the LAST arrival; a batch frame has no arrival
    order, so the deterministic tie-break is the key minimum — documented
    divergence, same survivor-set cardinality.)"""
    w = df.groupBy(sig_col).agg(F.min(key_col).alias(key_col))
    return df.join(w, [sig_col, key_col], "left_semi")


def html_strip(df: DataFrame, field: str) -> DataFrame:
    """Markup removal (HTMLStripCharFilter through the URP factory): tags
    drop, text between them survives.  (The factory wraps the full
    charfilter; entities/script handling beyond tag removal is the analyzer
    chain's job — pages.extract_text_expr is the corpus-specific extractor.)"""
    return df.withColumn(field, F.regexp_replace(F.col(field), "<[^>]*>", ""))


def default_value(df: DataFrame, field: str, value) -> DataFrame:
    return df.withColumn(field, F.coalesce(F.col(field), F.lit(value)))


def trim_field(df: DataFrame, field: str) -> DataFrame:
    return df.withColumn(field, F.trim(F.col(field)))


def regex_replace(df: DataFrame, field: str, pattern: str, repl: str) -> DataFrame:
    return df.withColumn(field, F.regexp_replace(F.col(field), pattern, repl))


def clone_field(df: DataFrame, src: str, dest: str) -> DataFrame:
    return df.withColumn(dest, F.col(src))


def field_length(df: DataFrame, field: str, out: str | None = None) -> DataFrame:
    return df.withColumn(out or f"{field}_length", F.length(F.col(field)))


def chain(*processors):
    """Ordered composition (UpdateRequestProcessorChain): each entry is a
    callable DataFrame -> DataFrame (bind parameters with functools.partial
    or lambdas)."""

    def run(df: DataFrame) -> DataFrame:
        for p in processors:
            df = p(df)
        return df

    return run


# ---------------------------------------------------------------------------
# Atomic updates + optimistic concurrency (round 3b).
#
# Reference: DistributedUpdateProcessor.getUpdatedDocument
# (solr/core/src/java/org/apache/solr/update/processor/
# DistributedUpdateProcessor.java:1020-1090) merges {"set"/"add"/"remove"/
# "inc"} field modifiers onto the stored document fetched via RealTimeGet;
# versionAdd (:760-900) enforces the _version_ contract.  The Spark analog
# merges a whole UPDATE BATCH against the stored docs frame in one join —
# callers compose the merged frame with store.update_documents (delete+add).
# ---------------------------------------------------------------------------


class VersionConflictError(ValueError):
    """HTTP 409 analog (SolrException CONFLICT in versionAdd)."""


_ATOMIC_OPS = ("set", "inc", "add", "remove")


def atomic_merge(
    existing: DataFrame,
    updates: DataFrame,
    ops: dict[str, str],
    key_col: str = "url",
) -> DataFrame:
    """Merge an update batch onto stored documents with per-field modifiers.

    ``ops`` maps field -> one of set/inc/add/remove (each update column
    applies ONE modifier for the whole batch — the columnar form of the
    per-document modifier maps; heterogeneous per-row ops are two batches).
    Unlisted stored fields carry over unchanged; a key with no stored doc
    creates one (Solr's atomic-update-on-absent-doc behavior), with inc
    treating the missing old value as 0 and add as an empty list.

    Semantics per DistributedUpdateProcessor.getUpdatedDocument:
      set    -> replace (null update value = keep old, matching a field
                omitted from the SolrInputDocument; Solr's set-to-null
                REMOVAL is expressed by remove on a scalar here)
      inc    -> old + delta (numeric)
      add    -> append value(s) to the multivalued field
      remove -> drop exact value(s) from the multivalued field
    """
    for f, op in ops.items():
        if op not in _ATOMIC_OPS:
            raise ValueError(f"unknown atomic op {op!r} for field {f!r}")
        if f not in updates.columns:
            raise ValueError(f"update batch missing column {f!r}")
    e, u = existing.alias("e"), updates.alias("u")
    joined = u.join(e, key_col, "left")
    cols = [F.col(f"u.{key_col}").alias(key_col)]
    carried = [
        c for c in existing.columns if c != key_col and c not in ops
    ]
    for c in carried:
        cols.append(F.col(f"e.{c}").alias(c))
    for f, op in ops.items():
        old = F.col(f"e.{f}") if f in existing.columns else F.lit(None)
        new = F.col(f"u.{f}")
        if op == "set":
            merged = F.coalesce(new, old)
        elif op == "inc":
            merged = F.coalesce(old, F.lit(0)) + F.coalesce(new, F.lit(0))
        elif op == "add":
            base = F.coalesce(old, F.array().cast("array<string>"))
            merged = F.when(new.isNull(), base).otherwise(
                F.concat(base, F.array(new.cast("string")))
            )
        else:  # remove
            base = F.coalesce(old, F.array().cast("array<string>"))
            merged = F.when(new.isNull(), base).otherwise(
                F.array_remove(base, new.cast("string"))
            )
        cols.append(merged.alias(f))
    return joined.select(*cols)


def check_versions(
    existing: DataFrame,
    updates: DataFrame,
    key_col: str = "url",
    version_col: str = "_version_",
) -> None:
    """Optimistic concurrency gate (versionAdd,
    DistributedUpdateProcessor.java:760-900):

      update _version_ >  1 -> stored doc must exist with EXACTLY that version
      update _version_ == 1 -> stored doc must exist (any version)
      update _version_ <  0 -> stored doc must NOT exist
      update _version_ == 0 / null -> no check

    Raises VersionConflictError naming up to 5 conflicting keys.  One
    bounded action (the conflict set is empty in the happy path)."""
    if version_col not in updates.columns:
        return
    e = existing.select(
        F.col(key_col), F.col(version_col).alias("_stored_v")
    ) if version_col in existing.columns else existing.select(
        F.col(key_col), F.lit(None).cast("long").alias("_stored_v")
    )
    u = updates.select(F.col(key_col), F.col(version_col).alias("_want_v"))
    j = u.join(e, key_col, "left")
    want, stored = F.col("_want_v"), F.col("_stored_v")
    conflict = (
        ((want > 1) & (stored.isNull() | (stored != want)))
        | ((want == 1) & stored.isNull())
        | ((want < 0) & stored.isNotNull())
    )
    bad = j.filter(conflict).select(key_col).limit(5).collect()
    if bad:
        keys = [r[0] for r in bad]
        raise VersionConflictError(
            f"version conflict on {len(keys)}+ docs, e.g. {keys}"
        )


def lang_id(
    df: DataFrame,
    id_col: str = "doc_id",
    input_field: str = "text",
    lang_field: str = "language_s",
    threshold: int = 1,
    fallback: str = "und",
    overwrite: bool = False,
) -> DataFrame:
    """LanguageIdentifierUpdateProcessor (solr/contrib/langid/src/java/org/
    apache/solr/update/processor/LanguageIdentifierUpdateProcessor.java:
    60-130,199-260): detect the input field's language into ``lang_field``;
    evidence below ``threshold`` takes the ``fallback`` value; an existing
    non-null ``lang_field`` is kept unless ``overwrite`` (java :221-233
    langField-already-set branch).  Detection is the engine's lexicon-marker
    heuristic (textops.analyze.language_id — one codegen projection; the
    reference's Tika/langdetect profiles are its pluggable analog)."""
    from lucene_solr_spark.textops.analyze import language_id

    pred = language_id(df, id_col=id_col, text_col=input_field).select(
        F.col("docid").alias(id_col),
        F.when(F.col("evidence") >= threshold, F.col("pred_lang"))
        .otherwise(F.lit(fallback))
        .alias("_detected"),
    )
    out = df.join(pred, id_col, "left")
    if lang_field in df.columns and not overwrite:
        keep = F.coalesce(F.col(lang_field), F.col("_detected"))
    else:
        keep = F.col("_detected")
    return out.withColumn(lang_field, keep).drop("_detected")


def timestamp_field(
    df: DataFrame, now_epoch_ms: int, field: str = "timestamp"
) -> DataFrame:
    """TimestampUpdateProcessorFactory: stamp each doc missing ``field``
    with the request's pinned NOW (determinism requires an explicit NOW,
    the same discipline as ms(NOW,...) function queries)."""
    stamp = F.timestamp_millis(F.lit(now_epoch_ms))
    if field in df.columns:
        return df.withColumn(field, F.coalesce(F.col(field), stamp))
    return df.withColumn(field, stamp)


def uuid_field(df: DataFrame, key_col: str, field: str = "id") -> DataFrame:
    """UUIDUpdateProcessorFactory analog with a deterministic twist: the
    reference mints random UUIDs; a distributed re-runnable pipeline needs
    idempotence, so the UUID is version-3-style — derived from the md5 of
    the unique key (same doc -> same id on every replay)."""
    h = F.md5(F.col(key_col).cast("string"))
    # RFC 4122: version nibble = 3 (name-based md5), variant digit forced
    # into 8..b via (nibble & 0x3) | 0x8 so the strings pass strict v3
    # validation (the raw 17th hex digit could be any of 0-f)
    variant = F.conv(
        (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4 + 8).cast(
            "string"
        ),
        10,
        16,
    )
    uuid = F.lower(
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.concat(F.lit("3"), F.substring(h, 14, 3)),
            F.concat(variant, F.substring(h, 18, 3)),
            F.substring(h, 21, 12),
        )
    )
    return df.withColumn(field, uuid)


def ttl_field(
    df: DataFrame,
    now_epoch_ms: int,
    ttl_col: str = "_ttl_",
    field: str = "_expire_at_",
) -> DataFrame:
    """DocExpirationUpdateProcessorFactory's compute step (solr/core/src/
    java/org/apache/solr/update/processor/DocExpirationUpdateProcessorFactory
    .java — the ttlFieldName/expirationFieldName contract): a per-doc TTL
    date-math string (``+30SECONDS``, ``+2HOURS``, ...) resolves against
    the request's pinned NOW into an absolute expiration timestamp; docs
    without a TTL get none and never expire."""
    from lucene_solr_spark.functions.date_math import parse_date_math

    # date-math parses driver-side per DISTINCT ttl spec (a handful of
    # strings), then joins back as data — no per-row Python
    specs = [
        r[0]
        for r in df.select(ttl_col).where(F.col(ttl_col).isNotNull())
        .distinct().collect()
    ]
    mapping = [
        (s, parse_date_math("NOW" + s, now_epoch_ms)) for s in specs
    ]
    spark = df.sparkSession
    if mapping:
        mdf = spark.createDataFrame(mapping, f"{ttl_col} string, _exp_ms long")
        out = df.join(F.broadcast(mdf), ttl_col, "left")
    else:
        out = df.withColumn("_exp_ms", F.lit(None).cast("long"))
    return out.withColumn(
        field, F.timestamp_millis(F.col("_exp_ms"))
    ).drop("_exp_ms")


def expiration_sweep(
    df: DataFrame, now_epoch_ms: int, field: str = "_expire_at_"
) -> DataFrame:
    """The factory's periodic delete sweep (deleteByQuery
    {expirationField:[* TO NOW]}): keep only unexpired docs.  Through the
    store this is ``delete_by_query`` on the same predicate; standalone it
    is one codegen filter."""
    now = F.timestamp_millis(F.lit(now_epoch_ms))
    return df.where(F.col(field).isNull() | (F.col(field) > now))
