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
    """Encode one (index_partition, term-bucket) group of postings.

    Vectorized ACROSS terms: the per-term loop version spent ~0.4 ms/term in
    numpy call overhead (a group holds thousands of low-df terms, so overhead
    dominated kernel time).  All delta/varbyte/block math here runs over the
    whole group at once with per-term resets; per-term output rows are byte
    slices of the group-wide buffers.  Byte-identical to encoding each term
    with ``encode_postings`` (differential-tested)."""
    from lucene_solr_spark.index.codec import BLOCK_SIZE, _vb_lengths, vb_encode

    part = int(pdf["index_partition"].iloc[0])
    terms = pdf["term"].to_numpy()
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl_approx"].to_numpy(dtype=np.float64)

    # sort on integer term codes, not strings (codes are assigned in
    # lexicographic term order, so the row order is identical)
    uniq, codes = np.unique(terms, return_inverse=True)
    order = np.lexsort((docids, codes))
    codes, docids, tfs, dls = codes[order], docids[order], tfs[order], dls[order]
    norms = _norm_byte_from_dl(dls)

    starts = np.flatnonzero(np.diff(codes, prepend=-1))
    n = len(codes)
    bounds = np.append(starts, n)
    counts = np.diff(bounds)

    # docid deltas with a reset at each term start
    gaps = docids.copy()
    gaps[1:] -= docids[:-1]
    gaps[starts] = docids[starts]
    inner = np.ones(n, dtype=bool)
    inner[starts] = False
    if np.any(gaps[inner] <= 0):
        raise ValueError("doc_ids must be strictly increasing per term")

    gap_u = gaps.astype(np.uint64)
    tf_u = tfs.astype(np.uint64)
    gap_buf = vb_encode(gap_u)
    tf_buf = vb_encode(tf_u)
    gap_ends0 = np.concatenate(([0], np.cumsum(_vb_lengths(gap_u))))
    tf_ends0 = np.concatenate(([0], np.cumsum(_vb_lengths(tf_u))))
    norms_buf = norms.tobytes()

    # 128-posting blocks, globally: every term start begins a block, so block
    # starts are simply the rows whose within-term index is ≡ 0 (mod 128)
    within = np.arange(n) - np.repeat(starts, counts)
    b_starts = np.flatnonzero(within % BLOCK_SIZE == 0)
    b_ends = np.append(b_starts[1:], n) - 1
    block_last = docids[b_ends]
    block_max_tf = np.maximum.reduceat(tfs, b_starts).astype(np.int32)
    block_min_dlb = np.maximum.reduceat(
        norms.astype(np.int64), b_starts
    ).astype(np.int32)
    blocks_per_term = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    # byte offset of each block's first value WITHIN its term's blob
    blk_doc_off = gap_ends0[b_starts] - np.repeat(gap_ends0[starts], blocks_per_term)
    blk_tf_off = tf_ends0[b_starts] - np.repeat(tf_ends0[starts], blocks_per_term)
    blk_bounds = np.concatenate(([0], np.cumsum(blocks_per_term)))

    go, to = gap_ends0[bounds], tf_ends0[bounds]
    nt = len(uniq)
    return pd.DataFrame(
        {
            "index_partition": np.full(nt, part, dtype=np.int32),
            "term": uniq,
            "df_part": counts.astype(np.int32),
            "cf_part": np.add.reduceat(tfs, starts).astype(np.int64),
            "first_docid": docids[starts],
            "doc_gaps_vb": [gap_buf[go[i]:go[i + 1]] for i in range(nt)],
            "tfs_vb": [tf_buf[to[i]:to[i + 1]] for i in range(nt)],
            "norm_bytes": [norms_buf[bounds[i]:bounds[i + 1]] for i in range(nt)],
            "block_last_docid": np.split(block_last, blk_bounds[1:-1]),
            "block_max_tf": np.split(block_max_tf, blk_bounds[1:-1]),
            "block_min_dlb": np.split(block_min_dlb, blk_bounds[1:-1]),
            "block_doc_off": np.split(blk_doc_off, blk_bounds[1:-1]),
            "block_tf_off": np.split(blk_tf_off, blk_bounds[1:-1]),
        }
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
    """Encode one (index_partition, term-bucket) group of pre-aggregated
    position rows: one input row per (term, docid) carrying the sorted
    position array.

    Vectorized across terms like ``_encode_group``: the three varbyte streams
    (doc gaps, per-doc position counts, position deltas) are computed over
    the whole group with resets at term/doc boundaries, then sliced per term.
    Byte-identical to per-term ``encode_positions`` (differential-tested)."""
    from lucene_solr_spark.index.codec import _vb_lengths, vb_encode

    part = int(pdf["index_partition"].iloc[0])
    terms = pdf["term"].to_numpy()
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    dls = pdf["dl_approx"].to_numpy(dtype=np.float64)
    lists = pdf["poss"].to_numpy()

    # sort rows on integer term codes, not strings (codes are assigned in
    # lexicographic term order, so the row order is identical); docid breaks
    # ties — rows are unique (term, doc) pairs
    uniq, codes = np.unique(terms, return_inverse=True)
    order = np.lexsort((docids, codes))
    codes, docids, dls, lists = codes[order], docids[order], dls[order], lists[order]
    norms = _norm_byte_from_dl(dls)

    nrows = len(codes)
    t_starts = np.flatnonzero(np.diff(codes, prepend=-1))
    row_bounds = np.append(t_starts, nrows)  # term boundaries in row space
    docs_per_term = np.diff(row_bounds)

    # docid gaps (one row per unique (term, doc)), reset at each term's start
    gaps = docids.copy()
    gaps[1:] -= docids[:-1]
    gaps[t_starts] = docids[t_starts]
    inner = np.ones(nrows, dtype=bool)
    inner[t_starts] = False
    if np.any(gaps[inner] <= 0):
        raise ValueError("doc_ids must be strictly increasing per term")

    # flatten position arrays in sorted row order -> the occurrence stream
    per_doc_counts = np.fromiter(
        (len(a) for a in lists), dtype=np.int64, count=nrows
    )
    flat = (
        np.concatenate(list(lists)).astype(np.int64)
        if nrows
        else np.empty(0, dtype=np.int64)
    )
    occ_bounds = np.concatenate(([0], np.cumsum(per_doc_counts)))
    d_starts = occ_bounds[:-1]  # each (term, doc)'s first occurrence

    # position deltas, reset at each (term, doc) start
    deltas = flat.copy()
    deltas[1:] -= flat[:-1]
    deltas[d_starts] = flat[d_starts]
    if np.any(deltas < 0):
        raise ValueError("positions must be ascending within each doc")

    gap_u = gaps.astype(np.uint64)
    cnt_u = per_doc_counts.astype(np.uint64)
    del_u = deltas.astype(np.uint64)
    gap_buf, cnt_buf, del_buf = vb_encode(gap_u), vb_encode(cnt_u), vb_encode(del_u)
    gap_ends0 = np.concatenate(([0], np.cumsum(_vb_lengths(gap_u))))
    cnt_ends0 = np.concatenate(([0], np.cumsum(_vb_lengths(cnt_u))))
    del_ends0 = np.concatenate(([0], np.cumsum(_vb_lengths(del_u))))
    norms_buf = norms.tobytes()

    go, co = gap_ends0[row_bounds], cnt_ends0[row_bounds]
    do = del_ends0[occ_bounds[row_bounds]]
    nt = len(uniq)
    return pd.DataFrame(
        {
            "index_partition": np.full(nt, part, dtype=np.int32),
            "term": uniq,
            "df_part": docs_per_term.astype(np.int32),
            "first_docid": docids[t_starts],
            "doc_gaps_vb": [gap_buf[go[i]:go[i + 1]] for i in range(nt)],
            "pos_counts_vb": [cnt_buf[co[i]:co[i + 1]] for i in range(nt)],
            "positions_vb": [del_buf[do[i]:do[i + 1]] for i in range(nt)],
            "norm_bytes": [
                norms_buf[row_bounds[i]:row_bounds[i + 1]] for i in range(nt)
            ],
        }
    )


def compress_positions(positions: DataFrame, term_buckets: int = 64) -> DataFrame:
    """Encode a positions layer into position segment rows — the persisted
    DOCS_AND_FREQS_AND_POSITIONS layer (Lucene41 .pos analog).  Same
    salted-shuffle shape as compress_postings.

    Accepts either the builder's pre-aggregated frame
    (index_partition, term, docid, poss:array<int>, dl_approx) — preferred:
    the wide shuffle then ships one row per (term, doc) (~df rows) instead of
    one per occurrence (~cf rows), a ~10x volume cut on web text — or the
    per-occurrence view (…, pos, dl_approx), which is first aggregated to
    the same shape (partition-local when the input is hash-partitioned by
    index_partition, as the build layout is)."""
    if "poss" in positions.columns:
        grouped = positions.select(
            "index_partition", "term", "docid", "poss", "dl_approx"
        )
    else:
        grouped = (
            positions.select("index_partition", "term", "docid", "pos", "dl_approx")
            .groupBy("index_partition", "term", "docid")
            .agg(
                F.array_sort(F.collect_list("pos")).alias("poss"),
                F.first("dl_approx").alias("dl_approx"),
            )
        )
    bucket = F.pmod(F.xxhash64("term"), F.lit(term_buckets))
    return (
        grouped.groupBy("index_partition", bucket.alias("_bucket"))
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
