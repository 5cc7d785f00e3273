"""Payload analysis chain — DelimitedPayloadTokenFilter + encoders, and the
payload-carrying postings frame PayloadTermQuery scores over.

Reference semantics (public Apache Lucene 4.10.5 source, studied at
/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/
payloads/):

- ``DelimitedPayloadTokenFilter`` (DelimitedPayloadTokenFilter.java:39-70):
  each token is split at the FIRST delimiter character (default ``|``); the
  prefix stays the term, the remainder is encoded as the payload.  Tokens
  without the delimiter carry NO payload (null, not empty).  The tokenizer
  must not split on the delimiter, so the chain runs over the whitespace
  tokenizer.
- Encoders (FloatEncoder.java / IntegerEncoder.java / IdentityEncoder.java):
  ``float`` parses the suffix as float32 (PayloadHelper.encodeFloat),
  ``integer`` as int, ``identity`` keeps the raw characters.

The payloads frame is columnar: one row per (docid, term) with ``tf`` (ALL
occurrences, with or without payload), ``payloads`` (the decoded values of
payload-carrying occurrences only, in position order — PayloadTermQuery's
``isPayloadAvailable()`` gate skips payload-less occurrences entirely,
PayloadTermQuery.java:124-145), ``dl_approx`` (the byte-315-quantized doc
length of the payload field, same norms discipline as the main index).

Scale shape: one projection (tokenize + struct transform, all JVM-side
higher-order functions), one explode + hash aggregate on (docid, term), one
broadcast range join for the norm byte.  No Python in the loop; the frame
partitions by docid like the main postings.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.tokenizers import whitespace_tokenizer
from lucene_solr_spark.index.builder import _norm_ranges_df


def delimited_payload_tokens(
    text: Column, delimiter: str = "|", encoder: str = "float"
) -> Column:
    """array<struct<term, payload>> — the DelimitedPayloadTokenFilter chain
    over whitespace tokens.  ``payload`` is double (float/integer encoders,
    float32-parsed first like PayloadHelper) or string (identity); null when
    the token has no delimiter."""
    if encoder not in ("float", "integer", "identity"):
        raise ValueError(f"unknown payload encoder {encoder!r}")
    d = delimiter

    def split(tok: Column) -> Column:
        idx = F.instr(tok, d)  # FIRST delimiter occurrence (java :57-63)
        term = F.when(idx > 0, F.substring_index(tok, d, 1)).otherwise(tok)
        raw = F.when(idx > 0, F.substring(tok, idx + F.lit(1), F.length(tok)))
        if encoder == "float":
            # Float.parseFloat -> float32 value (FloatEncoder.java:31-36)
            pay = raw.cast("float").cast("double")
        elif encoder == "integer":
            pay = raw.cast("int").cast("double")
        else:
            pay = raw
        return F.struct(term.alias("term"), pay.alias("payload"))

    return F.transform(whitespace_tokenizer(text), split)


def token_type_col(tok: Column) -> Column:
    """StandardTokenizer token-type classification for a single token
    (StandardTokenizer.java:61-91 TOKEN_TYPES): ``<NUM>`` for digit-bearing
    numeric runs, ``<IDEOGRAPHIC>`` for Han/Hiragana single-char tokens,
    ``<HANGUL>`` for Hangul runs, else ``<ALPHANUM>``."""
    return (
        F.when(tok.rlike(r"^[0-9][0-9.,]*$"), F.lit("<NUM>"))
        .when(tok.rlike(r"^[一-鿿぀-ゟ]$"), F.lit("<IDEOGRAPHIC>"))
        .when(tok.rlike(r"^[가-힯]+$"), F.lit("<HANGUL>"))
        .otherwise(F.lit("<ALPHANUM>"))
    )


def type_as_payload_tokens(text: Column) -> Column:
    """TypeAsPayloadTokenFilter (TypeAsPayloadTokenFilter.java:30-47):
    every token carries its type string as the payload.  Returns
    array<struct<term, payload:string>> over whitespace tokens."""
    return F.transform(
        whitespace_tokenizer(text),
        lambda t: F.struct(t.alias("term"), token_type_col(t).alias("payload")),
    )


def numeric_payload_tokens(
    text: Column, payload: float, type_match: str = "<ALPHANUM>"
) -> Column:
    """NumericPayloadTokenFilter (NumericPayloadTokenFilter.java:30-50):
    tokens whose type equals ``type_match`` carry the constant float
    ``payload``; other tokens carry none (null)."""
    return F.transform(
        whitespace_tokenizer(text),
        lambda t: F.struct(
            t.alias("term"),
            F.when(
                token_type_col(t) == F.lit(type_match), F.lit(float(payload))
            ).alias("payload"),
        ),
    )


def token_offset_payload_tokens(text: Column) -> Column:
    """TokenOffsetPayloadTokenFilter (TokenOffsetPayloadTokenFilter.java:
    30-48): each token's payload is its (startOffset, endOffset) pair.
    Returns array<struct<term, start_offset, end_offset>> over whitespace
    tokens — offsets computed from cumulative token positions in the raw
    string (whitespace tokenizer keeps the source text intact)."""
    toks = whitespace_tokenizer(text)

    # one left fold carrying a 1-based search cursor; each token's start is
    # its first occurrence at-or-after the cursor (whitespace tokens always
    # reappear verbatim in the source)
    def step(acc: Column, t: Column) -> Column:
        found = F.instr(F.substring(text, acc["cursor"], 1 << 30), t)
        start = (acc["cursor"] + found - 2).cast("int")  # 0-based absolute
        end = (start + F.length(t)).cast("int")
        return F.struct(
            (end + 1).cast("int").alias("cursor"),  # back to 1-based
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        t.alias("term"),
                        start.alias("start_offset"),
                        end.alias("end_offset"),
                    )
                ),
            ).alias("out"),
        )

    init = F.expr(
        "named_struct('cursor', 1, 'out',"
        " cast(array() as array<struct<term:string,"
        " start_offset:int, end_offset:int>>))"
    )
    return F.aggregate(toks, init, step, lambda acc: acc["out"])


@dataclass
class PayloadIndex:
    """Payload postings + the collection stats PayloadTermQuery needs."""

    postings: DataFrame  # (docid, term, tf, payloads array, dl_approx)
    max_doc: int
    avgdl: float  # float32-rounded, like BM25Similarity.java:82-87
    positions: DataFrame | None = None  # (docid, pos, term, payload, dl_approx)

    def term_df(self, term: str) -> int:
        return (
            self.postings.filter(F.col("term") == term)
            .select("docid").distinct().count()
        )


def build_payload_index(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    docid_col: str = "doc_id",
    delimiter: str = "|",
    encoder: str = "float",
) -> PayloadIndex:
    """Build the payload postings frame from a payload-delimited text column."""
    pt = delimited_payload_tokens(F.col(text_col), delimiter, encoder)
    base = docs.select(
        F.col(docid_col).cast("long").alias("docid"), pt.alias("_pt")
    )
    base = base.withColumn("_dl", F.size("_pt"))
    occ = base.select(
        "docid",
        "_dl",
        F.posexplode_outer("_pt").alias("_pos", "_tok"),
    )
    per_term = (
        occ.where(F.col("_tok").isNotNull())
        .groupBy("docid", "_dl", F.col("_tok.term").alias("term"))
        .agg(
            F.count(F.lit(1)).alias("tf"),
            # position-ordered payload list, nulls (payload-less
            # occurrences) dropped — the isPayloadAvailable() skip
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_tok.payload").isNotNull(),
                        F.struct("_pos", F.col("_tok.payload").alias("p")),
                    )
                )
            ).alias("_pp"),
        )
        .withColumn("payloads", F.col("_pp.p"))
        .drop("_pp")
    )
    ranges = _norm_ranges_df(spark)
    per_term = (
        per_term.join(
            F.broadcast(ranges),
            (F.col("_dl") >= F.col("dl_lo")) & (F.col("_dl") <= F.col("dl_hi")),
            "left",
        )
        .withColumn(
            "dl_approx", F.coalesce(F.col("dl_approx"), F.lit(float("inf")))
        )
        .select("docid", "term", "tf", "payloads", "dl_approx")
    )
    positions = (
        occ.where(F.col("_tok").isNotNull())
        .join(
            F.broadcast(ranges),
            (F.col("_dl") >= F.col("dl_lo")) & (F.col("_dl") <= F.col("dl_hi")),
            "left",
        )
        .select(
            "docid",
            F.col("_pos").alias("pos"),
            F.col("_tok.term").alias("term"),
            F.col("_tok.payload").alias("payload"),
            F.coalesce(F.col("dl_approx"), F.lit(float("inf"))).alias("dl_approx"),
        )
    )
    n = docs.count()
    total = base.agg(F.sum("_dl")).collect()[0][0] or 0
    import numpy as np

    avgdl = float(np.float32(total / n)) if n else 0.0
    return PayloadIndex(
        postings=per_term, max_doc=n, avgdl=avgdl, positions=positions
    )


def type_token_filter(
    text: Column, types: tuple[str, ...], use_whitelist: bool = False
) -> Column:
    """TypeTokenFilter (lucene/analysis/common/.../core/TypeTokenFilter.java
    + TypeTokenFilterFactory: types=.. useWhitelist=..): drop tokens whose
    StandardTokenizer type is in ``types`` (blacklist, the default) or keep
    ONLY those types (whitelist)."""
    tl = [str(t) for t in types]

    def keep(tok: Column) -> Column:
        hit = token_type_col(tok).isin(tl)
        return hit if use_whitelist else ~hit

    return F.filter(whitespace_tokenizer(text), keep)
