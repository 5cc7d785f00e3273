"""Compressed segment table: per-(term, index_partition) encoded posting lists.

The Lucene-segments analog (SegmentInfos.java:58-80 — index = set of immutable
segments): each ``index_partition`` is a segment; within it every term owns one
row carrying delta-gap + varbyte blobs (codec.py) plus per-block skip/block-max
metadata.  This table is the source for the document-at-a-time WAND kernel
(search/wand.py) and is what the persistent store writes partitioned by
``index_partition``.

Scale shape — learned the hard way: an earlier version aggregated posting
arrays JVM-side (collect_list + sort_array) and shipped array<struct> cells to
a scalar pandas UDF; head terms produce multi-MB cells and the per-cell Arrow
transfer became the pipeline bottleneck (and degraded with parallelism).  The
current shape ships plain scalar columns — the Arrow-friendliest layout — to
``applyInPandas`` over (index_partition, term-bucket) groups:

- one shuffle, keyed (partition, pmod(hash(term), B)) — the salt bounds any
  single task's data under head-term skew (mtree-merge pattern,
  MapReduceIndexerTool.java:322-351), B scales with corpus size;
- inside the kernel: one numpy lexsort per group, per-term slicing, varbyte
  encode — no per-row Python, no JVM array materialization;
- norm bytes are recovered from ``dl_approx`` by inverting BM25's NORM_TABLE
  (a 255-entry exact float lookup), so no join against the docs table at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.index.codec import encode_postings
from lucene_solr_spark.smallfloat import NORM_TABLE

COMPRESSED_SCHEMA = (
    "index_partition int, term string, df_part int, cf_part long, "
    "first_docid long, doc_gaps_vb binary, tfs_vb binary, norm_bytes binary, "
    "block_last_docid array<long>, block_max_tf array<int>, "
    "block_min_dlb array<int>, block_doc_off array<long>, "
    "block_tf_off array<long>"
)

# Reverse NORM_TABLE: dl_approx (float64 of the float32 decoded length) ->
# norm byte.  Bytes 1..255 have strictly decreasing finite decoded lengths;
# byte 0 decodes to +inf (empty docs — excluded from postings anyway).
_DLS = NORM_TABLE[1:256].astype(np.float64)          # decreasing
_DL_SORTED = _DLS[::-1].copy()                        # increasing for searchsorted
_BYTE_SORTED = np.arange(255, 0, -1)


def _norm_byte_from_dl(dl: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(_DL_SORTED, dl)
    idx = np.clip(idx, 0, 254)
    out = _BYTE_SORTED[idx].astype(np.uint8)
    # exact-match guard: dl values come FROM NORM_TABLE, so lookup is exact;
    # +inf (empty doc) would not match — map it to byte 0
    out[~np.isfinite(dl)] = 0
    return out


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    part = int(pdf["index_partition"].iloc[0])
    terms = pdf["term"].to_numpy()
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl_approx"].to_numpy(dtype=np.float64)

    order = np.lexsort((docids, terms))
    terms, docids, tfs, dls = terms[order], docids[order], tfs[order], dls[order]
    norms = _norm_byte_from_dl(dls)

    uniq, starts = np.unique(terms, return_index=True)
    bounds = np.append(starts, len(terms))
    rows = []
    for i, term in enumerate(uniq):
        lo, hi = bounds[i], bounds[i + 1]
        enc = encode_postings(docids[lo:hi], tfs[lo:hi], norms[lo:hi])
        rows.append(
            (
                part, term, int(hi - lo), int(tfs[lo:hi].sum()), int(docids[lo]),
                enc["doc_gaps_vb"], enc["tfs_vb"], enc["norm_bytes"],
                enc["block_last_docid"].tolist(),
                enc["block_max_tf"].tolist(),
                enc["block_min_dlb"].tolist(),
                enc["block_doc_off"].tolist(),
                enc["block_tf_off"].tolist(),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "index_partition", "term", "df_part", "cf_part", "first_docid",
            "doc_gaps_vb", "tfs_vb", "norm_bytes", "block_last_docid",
            "block_max_tf", "block_min_dlb", "block_doc_off", "block_tf_off",
        ],
    )


def compress_postings(postings: DataFrame, term_buckets: int = 64) -> DataFrame:
    """Encode any postings-shaped DataFrame
    (index_partition, term, docid, tf, dl_approx) into compressed segment
    rows.  ``term_buckets`` salts the shuffle key so one task never holds
    more than ~1/B of a partition's postings; raise it with corpus size."""
    p = postings.select("index_partition", "term", "docid", "tf", "dl_approx")
    bucket = F.pmod(F.xxhash64("term"), F.lit(term_buckets))
    return (
        p.groupBy("index_partition", bucket.alias("_bucket"))
        .applyInPandas(lambda pdf: _encode_group(pdf), COMPRESSED_SCHEMA)
    )


POSITIONS_SCHEMA = (
    "index_partition int, term string, df_part int, first_docid long, "
    "doc_gaps_vb binary, pos_counts_vb binary, positions_vb binary, "
    "norm_bytes binary"
)


def _encode_positions_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from lucene_solr_spark.index.codec import encode_positions

    part = int(pdf["index_partition"].iloc[0])
    terms = pdf["term"].to_numpy()
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    poss = pdf["pos"].to_numpy(dtype=np.int64)
    dls = pdf["dl_approx"].to_numpy(dtype=np.float64)

    order = np.lexsort((poss, docids, terms))
    terms, docids, poss, dls = terms[order], docids[order], poss[order], dls[order]
    norms = _norm_byte_from_dl(dls)

    uniq, starts = np.unique(terms, return_index=True)
    bounds = np.append(starts, len(terms))
    rows = []
    for i, term in enumerate(uniq):
        lo, hi = bounds[i], bounds[i + 1]
        enc = encode_positions(docids[lo:hi], poss[lo:hi], norms[lo:hi])
        rows.append(
            (
                part, term, int(np.unique(docids[lo:hi]).size), int(docids[lo]),
                enc["doc_gaps_vb"], enc["pos_counts_vb"], enc["positions_vb"],
                enc["norm_bytes"],
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "index_partition", "term", "df_part", "first_docid",
            "doc_gaps_vb", "pos_counts_vb", "positions_vb", "norm_bytes",
        ],
    )


def compress_positions(positions: DataFrame, term_buckets: int = 64) -> DataFrame:
    """Encode a positions-shaped DataFrame
    (index_partition, term, docid, pos, dl_approx) into position segment rows
    — the persisted DOCS_AND_FREQS_AND_POSITIONS layer (Lucene41 .pos
    analog).  Same salted-shuffle shape as compress_postings."""
    p = positions.select("index_partition", "term", "docid", "pos", "dl_approx")
    bucket = F.pmod(F.xxhash64("term"), F.lit(term_buckets))
    return (
        p.groupBy("index_partition", bucket.alias("_bucket"))
        .applyInPandas(lambda pdf: _encode_positions_group(pdf), POSITIONS_SCHEMA)
    )


def build_compressed_segments(
    index: IndexTables, persist: bool = True, term_buckets: int = 64
) -> DataFrame:
    """(index_partition, term, df_part, cf_part, first_docid, <encoded cols>)."""
    out = compress_postings(index.postings, term_buckets)
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
