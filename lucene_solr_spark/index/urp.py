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
