"""Postings codec: delta-gap + variable-byte blocks with block-max metadata.

Reference semantics re-expressed (Apache Lucene 4.10.5, /root/reference):

- Delta-encoded docIDs, strictly increasing
  (lucene/core/src/java/org/apache/lucene/codecs/lucene41/Lucene41PostingsWriter.java:295-301).
- Variable-byte integers: low 7 bits first, 0x80 continuation on all
  non-final bytes — the exact ``DataOutput.writeVInt`` wire format
  (lucene/core/src/java/org/apache/lucene/store/DataOutput.java).
- Blocks of 128 postings (Lucene41PostingsFormat.java:388 BLOCK_SIZE=128)
  with per-block skip metadata: last docID per block
  (Lucene41SkipWriter.java — one skip entry per block).  Where Lucene 4.10
  stores only skip pointers, we additionally store per-block ``max_tf`` and a
  precomputed per-block max of the BM25 tf/length factor, enabling block-max
  WAND pruning (Ding & Suel, SIGIR 2011 — public knowledge; the reference has
  no WAND, see SURVEY.md §4).
- Norm bytes ride along one uint8 per posting, mirroring Lucene's norms
  (one quantized byte per doc per field, BM25Similarity.java:95-97); the
  query kernel decodes them through the same NORM_TABLE.

Everything is vectorized numpy — these functions run inside Arrow-batched
pandas UDFs, never per-row Python.  At 100 TB the encoded segment table is
~1 row per (term, index_partition) with three binary blobs; Parquet+zstd
stores them page-compressed.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene41PostingsFormat.BLOCK_SIZE

K1 = 1.2
B = 0.75


def _vb_lengths(a: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (1..10) for writeVInt format."""
    nbytes = np.ones(a.size, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nbytes += v > 0
        v >>= np.uint64(7)
    return nbytes


def vb_encode(values: np.ndarray) -> bytes:
    """Vectorized variable-byte encode of a uint64 array (writeVInt format:
    low 7 bits first, high bit = continuation)."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = a.size
    if n == 0:
        return b""
    nbytes = _vb_lengths(a)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_b = int(nbytes.max())
    for k in range(max_b):
        mask = nbytes > k
        pos = starts[mask] + k
        chunk = (a[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > k
        out[pos] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Vectorized variable-byte decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    group = np.repeat(np.arange(n), lengths)
    pos_in_group = np.arange(b.size) - np.repeat(starts, lengths)
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, group, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos_in_group).astype(np.uint64))
    return out


def block_max_partial_bound(
    block_max_tf: np.ndarray, block_min_dlb: np.ndarray, avgdl: float
) -> np.ndarray:
    """Per-block upper bound on tf/(tf + k1*((1-b) + b*dl/avgdl)).

    The factor is increasing in tf and decreasing in dl, so evaluating it at
    (max tf in block, min dl in block) dominates every posting in the block.
    dl is decoded from the block's max norm byte (NORM_TABLE is decreasing in
    the byte).  avgdl enters only here, at query time — block metadata stays
    valid when incremental builds shift the collection's avgdl.
    """
    from lucene_solr_spark.smallfloat import NORM_TABLE

    tf = np.asarray(block_max_tf, dtype=np.float64)
    dl = NORM_TABLE[np.asarray(block_min_dlb, dtype=np.int64) & 0xFF].astype(np.float64)
    return tf / (tf + K1 * ((1.0 - B) + B * dl / float(avgdl)))


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    avgdl: float | None = None,
) -> dict:
    """Encode one sorted posting list into the segment-row payload.

    Returns dict with binary blobs + per-block skip/block-max metadata:
      doc_gaps_vb   — varbyte of docid deltas (first delta = first docid)
      tfs_vb        — varbyte of term frequencies
      norm_bytes    — raw uint8 per posting (Lucene norms analog)
      block_last_docid — int64 per block (skip list entry: last doc in block)
      block_max_tf     — int32 per block
      block_min_dlb    — int32 per block: max norm byte = minimal decoded doc
          length in the block; with block_max_tf this yields the query-time
          block-max WAND score bound (block_max_partial_bound) without baking
          a build-time avgdl into the index.
      block_doc_off / block_tf_off — int64 per block: byte offset of the
          block's first varbyte value in doc_gaps_vb / tfs_vb, so a surviving
          block decodes alone (the skip-pointer payload of
          Lucene41SkipWriter — docPointer/posPointer per skip entry); the
          docid base for block b>0 is block_last_docid[b-1].
    ``avgdl`` is accepted for API stability but unused.
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    nb = np.ascontiguousarray(norm_bytes, dtype=np.uint8)
    if not (d.size == t.size == nb.size):
        raise ValueError("doc_ids/tfs/norm_bytes length mismatch")
    if d.size and np.any(np.diff(d) <= 0):
        raise ValueError("doc_ids must be strictly increasing")

    gaps = np.empty_like(d)
    if d.size:
        gaps[0] = d[0]
        np.subtract(d[1:], d[:-1], out=gaps[1:])

    n = d.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last = np.empty(nblocks, dtype=np.int64)
    block_max_tf = np.empty(nblocks, dtype=np.int32)
    block_min_dlb = np.empty(nblocks, dtype=np.int32)
    for blk in range(nblocks):
        lo, hi = blk * BLOCK_SIZE, min((blk + 1) * BLOCK_SIZE, n)
        block_last[blk] = d[hi - 1]
        block_max_tf[blk] = t[lo:hi].max()
        block_min_dlb[blk] = nb[lo:hi].max()  # max byte == min decoded length

    block_starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
    gap_ends = np.concatenate(
        ([0], np.cumsum(_vb_lengths(gaps.astype(np.uint64))))
    )
    tf_ends = np.concatenate(([0], np.cumsum(_vb_lengths(t.astype(np.uint64)))))

    return {
        "doc_gaps_vb": vb_encode(gaps.astype(np.uint64)),
        "tfs_vb": vb_encode(t.astype(np.uint64)),
        "norm_bytes": nb.tobytes(),
        "block_last_docid": block_last,
        "block_max_tf": block_max_tf,
        "block_min_dlb": block_min_dlb,
        "block_doc_off": gap_ends[block_starts],
        "block_tf_off": tf_ends[block_starts],
    }


def encode_positions(
    doc_ids: np.ndarray, positions: np.ndarray, norm_bytes: np.ndarray
) -> dict:
    """Encode one term's position postings — the Lucene41 ``.pos`` stream
    analog (Lucene41PostingsWriter.java:329-352: per-doc position DELTAS in
    one stream, tf values per doc delimiting it).

    Inputs are occurrence-level arrays sorted by (docid, pos): ``doc_ids``
    repeated once per occurrence, ``positions`` ascending within each doc,
    ``norm_bytes`` repeated per occurrence.  Returns:
      doc_gaps_vb   — varbyte deltas of the UNIQUE docids
      pos_counts_vb — varbyte tf per doc (how many positions follow)
      positions_vb  — varbyte per-doc position deltas (first pos raw)
      norm_bytes    — raw uint8 per unique doc
    """
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    p = np.ascontiguousarray(positions, dtype=np.int64)
    nb = np.ascontiguousarray(norm_bytes, dtype=np.uint8)
    if not (d.size == p.size == nb.size):
        raise ValueError("doc_ids/positions/norm_bytes length mismatch")
    if d.size == 0:
        return {
            "doc_gaps_vb": b"", "pos_counts_vb": b"",
            "positions_vb": b"", "norm_bytes": b"",
        }
    uniq, starts = np.unique(d, return_index=True)
    counts = np.diff(np.append(starts, d.size))
    gaps = np.empty_like(uniq)
    gaps[0] = uniq[0]
    np.subtract(uniq[1:], uniq[:-1], out=gaps[1:])
    deltas = p.copy()
    deltas[1:] -= p[:-1]
    deltas[starts] = p[starts]  # reset at each doc boundary
    if np.any(deltas < 0):
        raise ValueError("positions must be ascending within each doc")
    return {
        "doc_gaps_vb": vb_encode(gaps.astype(np.uint64)),
        "pos_counts_vb": vb_encode(counts.astype(np.uint64)),
        "positions_vb": vb_encode(deltas.astype(np.uint64)),
        "norm_bytes": nb[starts].tobytes(),
    }


def decode_positions(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of encode_positions: occurrence-level
    (doc_ids int64 repeated, positions int64, norm_bytes uint8 repeated)."""
    gaps = vb_decode(bytes(row["doc_gaps_vb"])).astype(np.int64)
    if gaps.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint8)
    docs = np.cumsum(gaps)
    counts = vb_decode(bytes(row["pos_counts_vb"])).astype(np.int64)
    deltas = vb_decode(bytes(row["positions_vb"])).astype(np.int64)
    ends = np.cumsum(counts)
    cs = np.cumsum(deltas)
    corr = np.repeat(np.concatenate(([0], cs[ends[:-1] - 1])), counts)
    positions = cs - corr
    norms = np.frombuffer(bytes(row["norm_bytes"]), dtype=np.uint8)
    return np.repeat(docs, counts), positions, np.repeat(norms, counts)


def decode_postings(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of encode_postings: (doc_ids int64, tfs int64, norm_bytes uint8).

    ``row`` is any mapping with doc_gaps_vb / tfs_vb / norm_bytes."""
    gaps = vb_decode(bytes(row["doc_gaps_vb"])).astype(np.int64)
    doc_ids = np.cumsum(gaps)
    tfs = vb_decode(bytes(row["tfs_vb"])).astype(np.int64)
    norms = np.frombuffer(bytes(row["norm_bytes"]), dtype=np.uint8)
    return doc_ids, tfs, norms


def _has_offsets(row) -> bool:
    try:
        return row["block_doc_off"] is not None
    except (KeyError, IndexError, ValueError):
        # pyspark Row raises ValueError for a missing field name; dicts and
        # pandas rows raise KeyError — all mean "offset-less older encode"
        return False


def decode_block(row, blk: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single 128-posting block without touching other blocks.

    With byte offsets (``block_doc_off``/``block_tf_off``) only the block's
    own varbyte span is decoded — block-max skipping then saves decode work,
    not just scoring (the Lucene skip-pointer payload).  Offset-less rows
    (older encodes) fall back to full decode + slice; the WAND kernel
    memoizes per block either way.
    """
    lo = blk * BLOCK_SIZE
    hi = lo + BLOCK_SIZE
    if not _has_offsets(row):
        doc_ids, tfs, norms = decode_postings(row)
        return doc_ids[lo:hi], tfs[lo:hi], norms[lo:hi]

    doff = np.asarray(row["block_doc_off"], dtype=np.int64)
    toff = np.asarray(row["block_tf_off"], dtype=np.int64)
    dbuf = bytes(row["doc_gaps_vb"])
    tbuf = bytes(row["tfs_vb"])
    d_end = int(doff[blk + 1]) if blk + 1 < doff.size else len(dbuf)
    t_end = int(toff[blk + 1]) if blk + 1 < toff.size else len(tbuf)
    gaps = vb_decode(dbuf[int(doff[blk]):d_end]).astype(np.int64)
    base = int(row["block_last_docid"][blk - 1]) if blk > 0 else 0
    doc_ids = np.cumsum(gaps) + base
    tfs = vb_decode(tbuf[int(toff[blk]):t_end]).astype(np.int64)
    norms = np.frombuffer(bytes(row["norm_bytes"]), dtype=np.uint8)[lo:hi]
    return doc_ids, tfs, norms
