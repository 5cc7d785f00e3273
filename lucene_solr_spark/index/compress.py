"""Compressed segment table: per-(term, index_partition) encoded posting lists.

The Lucene-segments analog (SegmentInfos.java:58-80 — index = set of immutable
segments): each ``index_partition`` is a segment; within it every term owns one
row carrying delta-gap + varbyte blobs (codec.py) plus per-block skip/block-max
metadata.  This table is the source for the document-at-a-time WAND kernel
(search/wand.py) and is what the persistent store writes partitioned by
``index_partition``.

Scale shape: the encode is a single shuffle (groupBy term × partition — the
same salted layout as the mtree merge, so head-term skew is bounded by the
partition count) followed by an Arrow-batched pandas UDF that runs the numpy
encoder over whole record batches.  No per-row Python, no driver collect.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.index.codec import encode_postings

ENCODED_SCHEMA = StructType(
    [
        StructField("doc_gaps_vb", BinaryType()),
        StructField("tfs_vb", BinaryType()),
        StructField("norm_bytes", BinaryType()),
        StructField("block_last_docid", ArrayType(LongType())),
        StructField("block_max_tf", ArrayType(IntegerType())),
        StructField("block_min_dlb", ArrayType(IntegerType())),
    ]
)


def build_compressed_segments(index: IndexTables, persist: bool = True) -> DataFrame:
    """(index_partition, term, df_part, cf_part, first_docid, <encoded cols>).

    Postings joined with per-doc norm bytes (Lucene's norms file analog),
    aggregated to sorted (docid, tf, norm) arrays JVM-side, then encoded in one
    vectorized pandas UDF.
    """
    import numpy as np

    @F.pandas_udf(ENCODED_SCHEMA)
    def encode_udf(
        doc_ids: pd.Series, tfs: pd.Series, norms: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for d, t, nb in zip(doc_ids, tfs, norms):
            enc = encode_postings(
                np.asarray(d, dtype=np.int64),
                np.asarray(t, dtype=np.int64),
                np.asarray(nb, dtype=np.int64).astype(np.uint8),
            )
            rows.append(
                {
                    "doc_gaps_vb": enc["doc_gaps_vb"],
                    "tfs_vb": enc["tfs_vb"],
                    "norm_bytes": enc["norm_bytes"],
                    "block_last_docid": enc["block_last_docid"].tolist(),
                    "block_max_tf": enc["block_max_tf"].tolist(),
                    "block_min_dlb": enc["block_min_dlb"].tolist(),
                }
            )
        return pd.DataFrame(rows, columns=ENCODED_SCHEMA.fieldNames())

    p = index.postings.join(index.docs.select("docid", "norm_byte"), "docid")
    rows = (
        p.groupBy("index_partition", "term")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("docid", "tf", "norm_byte"))
            ).alias("plist"),
            F.count(F.lit(1)).cast("int").alias("df_part"),
            F.sum("tf").cast("long").alias("cf_part"),
        )
        .select(
            "index_partition",
            "term",
            "df_part",
            "cf_part",
            F.col("plist")[0]["docid"].alias("first_docid"),
            F.transform("plist", lambda s: s["docid"]).alias("_docids"),
            F.transform("plist", lambda s: s["tf"].cast("long")).alias("_tfs"),
            F.transform("plist", lambda s: s["norm_byte"].cast("long")).alias("_norms"),
        )
    )
    out = rows.select(
        "index_partition",
        "term",
        "df_part",
        "cf_part",
        "first_docid",
        encode_udf("_docids", "_tfs", "_norms").alias("_enc"),
    ).select(
        "index_partition", "term", "df_part", "cf_part", "first_docid", "_enc.*"
    )
    if persist:
        out = out.persist()
    return out


def get_compressed(index: IndexTables) -> DataFrame:
    """Cached accessor: build the compressed segment table on first use."""
    cached = getattr(index, "_compressed", None)
    if cached is None:
        cached = build_compressed_segments(index)
        object.__setattr__(index, "_compressed", cached)
    return cached
