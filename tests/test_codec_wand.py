"""Codec round-trip (property-tested) + WAND-vs-Catalyst rank identity.

Mirrors the reference's test strategy (SURVEY.md §5): BasePostingsFormatTestCase
random round-trips for the codec; differential testing across independent
implementations (TestRandomDVFaceting pattern) for the query kernel — here the
block-max WAND kernel vs the Catalyst-native scoring path.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.index.codec import (
    BLOCK_SIZE,
    decode_postings,
    encode_postings,
    vb_decode,
    vb_encode,
)


# ---------------------------------------------------------------------------
# varbyte
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert vb_decode(vb_encode(a)).tolist() == values


def test_vb_wire_format_matches_lucene_writevint():
    # DataOutput.writeVInt: low 7 bits first, 0x80 continuation.
    assert vb_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vb_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert vb_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert vb_encode(np.array([16384], dtype=np.uint64)) == b"\x80\x80\x01"
    assert vb_encode(np.array([300], dtype=np.uint64)) == bytes([0xAC, 0x02])


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


# ---------------------------------------------------------------------------
# posting-list encode/decode + block metadata
# ---------------------------------------------------------------------------

@st.composite
def posting_lists(draw):
    n = draw(st.integers(min_value=1, max_value=700))
    gaps = draw(
        st.lists(
            st.integers(min_value=1, max_value=1 << 20), min_size=n, max_size=n
        )
    )
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(
        draw(st.lists(st.integers(min_value=1, max_value=5000), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    norms = np.array(
        draw(st.lists(st.integers(min_value=1, max_value=255), min_size=n, max_size=n)),
        dtype=np.uint8,
    )
    return doc_ids, tfs, norms


@given(posting_lists())
@settings(max_examples=60, deadline=None)
def test_postings_roundtrip(pl):
    doc_ids, tfs, norms = pl
    enc = encode_postings(doc_ids, tfs, norms, avgdl=25.0)
    d2, t2, n2 = decode_postings(enc)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(n2, norms)
    # block metadata invariants
    nblocks = (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_last_docid"]) == nblocks
    for blk in range(nblocks):
        lo, hi = blk * BLOCK_SIZE, min((blk + 1) * BLOCK_SIZE, len(doc_ids))
        assert enc["block_last_docid"][blk] == doc_ids[hi - 1]
        assert enc["block_max_tf"][blk] == tfs[lo:hi].max()


@st.composite
def position_postings(draw):
    ndocs = draw(st.integers(min_value=1, max_value=60))
    doc_gaps = draw(
        st.lists(st.integers(min_value=1, max_value=1 << 16),
                 min_size=ndocs, max_size=ndocs)
    )
    docs = np.cumsum(np.array(doc_gaps, dtype=np.int64))
    doc_ids, positions, norms = [], [], []
    for d in docs:
        npos = draw(st.integers(min_value=1, max_value=8))
        gaps = draw(
            st.lists(st.integers(min_value=0, max_value=500),
                     min_size=npos, max_size=npos)
        )
        pos = np.cumsum(np.array(gaps, dtype=np.int64))
        # strictly ascending within doc is not required (gap 0 = same pos
        # would be unusual but the codec only needs non-decreasing)
        doc_ids.extend([d] * npos)
        positions.extend(pos.tolist())
        nb = draw(st.integers(min_value=1, max_value=255))
        norms.extend([nb] * npos)
    return (
        np.array(doc_ids, dtype=np.int64),
        np.array(positions, dtype=np.int64),
        np.array(norms, dtype=np.uint8),
    )


@given(position_postings())
@settings(max_examples=60, deadline=None)
def test_positions_roundtrip(pp):
    from lucene_solr_spark.index.codec import decode_positions, encode_positions

    doc_ids, positions, norms = pp
    enc = encode_positions(doc_ids, positions, norms)
    d2, p2, n2 = decode_positions(enc)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(p2, positions)
    np.testing.assert_array_equal(n2, norms)


def test_positions_encode_empty():
    from lucene_solr_spark.index.codec import decode_positions, encode_positions

    e = np.empty(0, dtype=np.int64)
    enc = encode_positions(e, e, np.empty(0, dtype=np.uint8))
    d2, p2, n2 = decode_positions(enc)
    assert d2.size == p2.size == n2.size == 0


def test_encode_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 3]), np.array([1, 1]), np.array([10, 10], dtype=np.uint8), 10.0
        )


def test_block_max_bound_dominates_all_postings():
    from lucene_solr_spark.index.codec import block_max_partial_bound
    from lucene_solr_spark.smallfloat import NORM_TABLE

    rng = np.random.default_rng(42)
    n = 1000
    doc_ids = np.cumsum(rng.integers(1, 50, n))
    tfs = rng.integers(1, 30, n)
    norms = rng.integers(1, 255, n).astype(np.uint8)
    enc = encode_postings(doc_ids, tfs, norms)
    for avgdl in (5.0, 25.0, 400.0):  # bound holds under avgdl drift
        bound = block_max_partial_bound(
            enc["block_max_tf"], enc["block_min_dlb"], avgdl
        )
        dl = NORM_TABLE[norms].astype(np.float64)
        partial = tfs / (tfs + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))
        for blk in range(len(enc["block_last_docid"])):
            lo, hi = blk * BLOCK_SIZE, min((blk + 1) * BLOCK_SIZE, n)
            assert partial[lo:hi].max() <= bound[blk] + 1e-12


# ---------------------------------------------------------------------------
# WAND kernel vs Catalyst path — rank identity (differential oracle)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def index(spark):
    from lucene_solr_spark.index.builder import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, passthrough_cols=("lang", "source", "n_chars"),
    )


WAND_CASES = [
    ("term_head", dict(must=["table"])),
    ("term_tail", dict(must=["vector"])),
    ("and2", dict(must=["table", "merge"])),
    ("and3", dict(must=["table", "scan", "join"])),
    ("or3", dict(should=["vector", "stream", "hash"])),
    ("or3_mm2", dict(should=["vector", "stream", "hash"], mm=2)),
    ("must_should", dict(must=["table"], should=["merge", "scan"])),
    ("not", dict(must=["table"], must_not=["slow"])),
    ("missing_term", dict(must=["zzzznotaterm"])),
    ("or_with_missing", dict(should=["table", "zzzznotaterm"])),
]


@pytest.mark.parametrize("name,spec", WAND_CASES, ids=[c[0] for c in WAND_CASES])
def test_wand_matches_catalyst(index, name, spec):
    from lucene_solr_spark.search import BooleanQuery, search
    from lucene_solr_spark.search.wand import wand_search

    q = BooleanQuery.of(**spec)
    for k in (5, 10):
        expected = [(r.docid, r.score) for r in search(index, q, k=k).collect()]
        got = [(r.docid, r.score) for r in wand_search(index, q, k=k).collect()]
        assert got == expected, f"{name} k={k}: {got} != {expected}"


def test_wand_must_not_does_not_displace(spark):
    """Excluded docs must not occupy per-partition heap slots: every top
    scorer for 'alpha' also matches the excluded term, so post-hoc anti-join
    of the partition top-k (the old implementation) would drop the whole
    page instead of returning the next-best clean docs."""
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search import BooleanQuery, search
    from lucene_solr_spark.search.wand import wand_search

    rows = [
        (i, "alpha alpha alpha bad") for i in range(10)  # high tf + excluded
    ] + [
        (i, "alpha filler words here padding") for i in range(10, 20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False,
    )
    q = BooleanQuery.of(must=["alpha"], must_not=["bad"])
    for k in (3, 5, 10):
        expected = [(r.docid, r.score) for r in search(idx, q, k=k).collect()]
        got = [(r.docid, r.score) for r in wand_search(idx, q, k=k).collect()]
        assert got == expected and len(got) == min(k, 10)


def test_wand_with_boost(index):
    from lucene_solr_spark.search import BooleanQuery, TermQuery, search
    from lucene_solr_spark.search.wand import wand_search

    q = BooleanQuery(
        must=(TermQuery("table", boost=2.0),), should=(TermQuery("merge"),)
    )
    expected = [(r.docid, r.score) for r in search(index, q, k=10).collect()]
    got = [(r.docid, r.score) for r in wand_search(index, q, k=10).collect()]
    assert got == expected


def test_compressed_segments_roundtrip_vs_segments(index):
    """Decoding every compressed row reproduces the uncompressed segment
    table exactly (CheckIndex-style structural verification of the codec
    against the independent array-native build path)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.compress import get_compressed

    comp = get_compressed(index)
    # global per-term df from compressed partitions == segment df
    agg = (
        comp.groupBy("term")
        .agg(F.sum("df_part").alias("df2"), F.sum("cf_part").alias("cf2"))
        .join(index.segments.select("term", "df", "cf"), "term", "full")
        .where(
            (F.col("df2") != F.col("df")) | (F.col("cf2") != F.col("cf"))
            | F.col("df").isNull() | F.col("df2").isNull()
        )
    )
    assert agg.count() == 0

    # decode a sample of rows and check docids/tfs against postings
    rows = comp.orderBy("term", "index_partition").limit(30).collect()
    post = (
        index.postings.select("term", "docid", "tf")
        .toPandas()
        .groupby("term")
    )
    for r in rows:
        d, t, _ = decode_postings(r.asDict())
        grp = post.get_group(r.term).sort_values("docid")
        part_mask = grp.docid % 8 == r.index_partition
        sub = grp[part_mask]
        np.testing.assert_array_equal(d, sub.docid.to_numpy())
        np.testing.assert_array_equal(t, sub.tf.to_numpy())


def test_decode_block_with_offsets_matches_full_decode():
    """Per-block byte offsets: each block decodes alone, identical to the
    slice of the full decode (incl. the docid base from the previous block's
    skip entry)."""
    from lucene_solr_spark.index.codec import (
        BLOCK_SIZE,
        decode_block,
        decode_postings,
        encode_postings,
    )

    rng = np.random.default_rng(7)
    n = 1000  # 8 blocks, last partial
    gaps = rng.integers(1, 5000, size=n)
    doc_ids = np.cumsum(gaps)
    tfs = rng.integers(1, 300, size=n)
    norms = rng.integers(1, 255, size=n).astype(np.uint8)
    enc = encode_postings(doc_ids, tfs, norms)
    assert len(enc["block_doc_off"]) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    full_d, full_t, full_n = decode_postings(enc)
    for blk in range(len(enc["block_doc_off"])):
        d, t, nb = decode_block(enc, blk)
        lo, hi = blk * BLOCK_SIZE, min((blk + 1) * BLOCK_SIZE, n)
        np.testing.assert_array_equal(d, full_d[lo:hi])
        np.testing.assert_array_equal(t, full_t[lo:hi])
        np.testing.assert_array_equal(nb, full_n[lo:hi])


def test_decode_block_fallback_without_offsets():
    from lucene_solr_spark.index.codec import BLOCK_SIZE, decode_block, encode_postings

    doc_ids = np.arange(1, 300, dtype=np.int64) * 3
    tfs = np.ones(299, dtype=np.int64)
    norms = np.full(299, 100, dtype=np.uint8)
    enc = encode_postings(doc_ids, tfs, norms)
    legacy = {k: v for k, v in enc.items() if not k.startswith("block_doc_off") and k != "block_tf_off"}
    d, t, nb = decode_block(legacy, 1)
    np.testing.assert_array_equal(d, doc_ids[BLOCK_SIZE : 2 * BLOCK_SIZE])


def test_group_encoders_match_per_term_reference():
    """The vectorized group kernels (compress._encode_group /
    _encode_positions_group) must be byte-identical to encoding each term
    separately with codec.encode_postings / encode_positions — randomized
    differential over zipf-shaped groups."""
    import pandas as pd

    from lucene_solr_spark.index.codec import encode_positions, encode_postings
    from lucene_solr_spark.index.compress import (
        _encode_group,
        _encode_positions_group,
        _norm_byte_from_dl,
    )
    from lucene_solr_spark.smallfloat import NORM_TABLE

    rng = np.random.default_rng(23)
    for _ in range(10):
        nterms = int(rng.integers(1, 50))
        dfs = np.clip(rng.zipf(1.4, nterms), 1, 600)
        terms = np.repeat([f"t{i:03d}" for i in range(nterms)], dfs)
        pdf = pd.DataFrame(
            {
                "index_partition": 3,
                "term": terms,
                "docid": rng.integers(0, 1 << 30, len(terms)),
                "tf": rng.integers(1, 30, len(terms)),
                "dl_approx": NORM_TABLE[
                    rng.integers(1, 255, len(terms))
                ].astype(np.float64),
            }
        ).drop_duplicates(["term", "docid"])

        got = _encode_group(pdf.copy())
        t = pdf["term"].to_numpy()
        d = pdf["docid"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        nb = _norm_byte_from_dl(pdf["dl_approx"].to_numpy(np.float64))
        order = np.lexsort((d, t))
        t, d, tf, nb = t[order], d[order], tf[order], nb[order]
        uniq, starts = np.unique(t, return_index=True)
        bounds = np.append(starts, len(t))
        assert list(got["term"]) == list(uniq)
        for i, row in got.reset_index(drop=True).iterrows():
            lo, hi = bounds[i], bounds[i + 1]
            ref = encode_postings(d[lo:hi], tf[lo:hi], nb[lo:hi])
            assert bytes(row["doc_gaps_vb"]) == ref["doc_gaps_vb"]
            assert bytes(row["tfs_vb"]) == ref["tfs_vb"]
            assert bytes(row["norm_bytes"]) == ref["norm_bytes"]
            assert int(row["df_part"]) == hi - lo
            assert int(row["cf_part"]) == int(tf[lo:hi].sum())
            assert int(row["first_docid"]) == int(d[lo])
            for key in ("block_last_docid", "block_max_tf", "block_min_dlb",
                        "block_doc_off", "block_tf_off"):
                assert list(row[key]) == list(ref[key]), key

        occ = pdf.loc[pdf.index.repeat(pdf["tf"].to_numpy())].copy()
        occ["pos"] = rng.integers(0, 2000, len(occ))
        occ = occ.drop_duplicates(["term", "docid", "pos"])
        occ = occ[["index_partition", "term", "docid", "pos", "dl_approx"]]
        # the kernel now takes the pre-aggregated shape (one row per
        # (term, doc) with a sorted position array), as compress_positions
        # builds it
        grp = (
            occ.sort_values(["term", "docid", "pos"])
            .groupby(["index_partition", "term", "docid"], as_index=False)
            .agg(
                poss=("pos", list),
                dl_approx=("dl_approx", "first"),
            )
        )
        gotp = _encode_positions_group(grp)
        t = occ["term"].to_numpy()
        d = occ["docid"].to_numpy(np.int64)
        p = occ["pos"].to_numpy(np.int64)
        nb = _norm_byte_from_dl(occ["dl_approx"].to_numpy(np.float64))
        order = np.lexsort((p, d, t))
        t, d, p, nb = t[order], d[order], p[order], nb[order]
        uniq, starts = np.unique(t, return_index=True)
        bounds = np.append(starts, len(t))
        assert list(gotp["term"]) == list(uniq)
        for i, row in gotp.reset_index(drop=True).iterrows():
            lo, hi = bounds[i], bounds[i + 1]
            ref = encode_positions(d[lo:hi], p[lo:hi], nb[lo:hi])
            assert bytes(row["doc_gaps_vb"]) == ref["doc_gaps_vb"]
            assert bytes(row["pos_counts_vb"]) == ref["pos_counts_vb"]
            assert bytes(row["positions_vb"]) == ref["positions_vb"]
            assert bytes(row["norm_bytes"]) == ref["norm_bytes"]
            assert int(row["df_part"]) == int(np.unique(d[lo:hi]).size)
            assert int(row["first_docid"]) == int(d[lo])


def test_wand_randomized_differential(spark):
    """Seeded random boolean queries (must/should/mm/must_not mixes) over a
    random corpus: the WAND kernel must equal the Catalyst path exactly —
    the TestRandomDVFaceting-style cross-implementation sweep applied to
    the two physical query paths."""
    import random

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search import BooleanQuery, search
    from lucene_solr_spark.search.wand import wand_search

    rng = random.Random(4242)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "zeta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=3, persist=True,
    )
    failures = []
    for qi in range(20):
        pool = rng.sample(vocab, rng.randint(1, 4))
        n_must = rng.randint(0, len(pool))
        must, should = pool[:n_must], pool[n_must:]
        if not must and not should:
            continue
        mm = rng.randint(0, len(should)) if should else 0
        rest = [t for t in vocab if t not in pool]
        must_not = rng.sample(rest, rng.randint(0, 2))
        q = BooleanQuery.of(must=must, should=should, mm=mm, must_not=must_not)
        k = rng.choice([3, 7, 10])
        want = [(r.docid, r.score) for r in search(idx, q, k=k).collect()]
        got = [(r.docid, r.score) for r in wand_search(idx, q, k=k).collect()]
        if got != want:
            failures.append((qi, must, should, mm, must_not, k, got[:3], want[:3]))
    idx.unpersist()
    assert not failures, failures[:3]
