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


@dataclass
class PayloadIndex:
    """Payload postings + the collection stats PayloadTermQuery needs."""

    postings: DataFrame  # (docid, term, tf, payloads array, dl_approx)
    max_doc: int
    avgdl: float  # float32-rounded, like BM25Similarity.java:82-87

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
    n = docs.count()
    total = base.agg(F.sum("_dl")).collect()[0][0] or 0
    import numpy as np

    avgdl = float(np.float32(total / n)) if n else 0.0
    return PayloadIndex(postings=per_term, max_doc=n, avgdl=avgdl)
