"""Lucene SmallFloat 3.1.5 norm quantization, re-implemented bit-exactly in numpy.

Reference semantics (public Apache Lucene 4.10.5 source, studied at
/root/reference/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98
and .../search/similarities/BM25Similarity.java:95-133):

- ``floatToByte315(f)``: take the raw IEEE-754 float32 bits of ``f``, shift right
  by 21 (keeping sign + 8 exponent bits + top 3 mantissa bits), subtract
  ``fzero = (63-15)<<3 = 384``; clamp to [0, 255] with the special cases
  ``f <= 0 -> 0``, ``0 < f < smallest -> 1``, ``overflow -> 255``.
- ``byte315ToFloat(b)``: inverse — ``bits = (b<<21) + ((63-15)<<24)``,
  reinterpret as float32; ``b == 0 -> 0.0``.
- BM25's ``NORM_TABLE[b] = 1f / (f*f)`` where ``f = byte315ToFloat(b)`` — i.e. the
  decoded (lossy) document length, computed **in float32**.

These are pure bit operations; numpy reproduces them exactly.
"""

from __future__ import annotations

import numpy as np

_FZERO = (63 - 15) << 3  # 384


def float_to_byte315(f) -> np.ndarray:
    """Vectorized Lucene SmallFloat.floatToByte315. Returns uint8 array."""
    f32 = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = f32.view(np.int32).astype(np.int64)
    smallfloat = bits >> 21
    mid = smallfloat - _FZERO
    out = np.where(
        smallfloat <= _FZERO,
        np.where(bits <= 0, 0, 1),
        np.where(smallfloat >= _FZERO + 0x100, 255, mid),
    )
    return out.astype(np.uint8)


def byte315_to_float(b) -> np.ndarray:
    """Vectorized Lucene SmallFloat.byte315ToFloat. Returns float32 array."""
    bb = np.atleast_1d(np.asarray(b, dtype=np.int64)) & 0xFF
    bits = (bb << 21) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(bb == 0, np.float32(0.0), out)


def encode_norm(num_terms) -> np.ndarray:
    """BM25Similarity.encodeNormValue(1.0f, numTerms) for an int array.

    Java: ``floatToByte315(boost / (float) Math.sqrt(numTerms))`` with boost=1.
    Replicated as float32(1) / float32(sqrt(double(n))) — IEEE-identical.
    numTerms == 0 encodes the float32 of 1/0 = +inf -> byte 255 (matches Java,
    where boost/(float)sqrt(0) = Infinity).
    """
    n = np.atleast_1d(np.asarray(num_terms, dtype=np.float64))
    with np.errstate(divide="ignore"):
        f = np.float32(1.0) / np.sqrt(n).astype(np.float32)
    return float_to_byte315(f)


# BM25Similarity NORM_TABLE: decoded approximate doc length per norm byte,
# computed in float32 exactly as the reference does (1f / (f*f)).
def _build_norm_table() -> np.ndarray:
    f = byte315_to_float(np.arange(256))
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


NORM_TABLE = _build_norm_table()  # float32[256]; NORM_TABLE[0] = +inf


def decoded_doc_len(norm_byte) -> np.ndarray:
    """Approximate doc length for a norm byte (BM25 NORM_TABLE lookup)."""
    return NORM_TABLE[np.asarray(norm_byte, dtype=np.int64) & 0xFF]


def sweetspot_length_norm(
    num_terms, ln_min: int = 1, ln_max: int = 1, steepness: float = 0.5
) -> np.ndarray:
    """SweetSpotSimilarity.computeLengthNorm (reference
    lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java:136-155)
    replicated cast-for-cast in float32:

        1/sqrt( s * (|x-l| + |x-h| - (h-l)) + 1 )

    Java evaluates ``s * (float)(intExpr) + 1.0f`` in float32, promotes to
    double for ``Math.sqrt``, divides ``1.0f / sqrt`` in double, and casts the
    result to float.  Degrades to 1/sqrt(x) at (min=1, max=1, steepness=0.5).
    Returns float32 array; the plateau [ln_min, ln_max] yields exactly 1.0.
    """
    x = np.atleast_1d(np.asarray(num_terms, dtype=np.int64))
    inner_i = np.abs(x - ln_min) + np.abs(x - ln_max) - (ln_max - ln_min)
    inner = np.float32(steepness) * inner_i.astype(np.float32) + np.float32(1.0)
    return (1.0 / np.sqrt(inner.astype(np.float64))).astype(np.float32)


def sweetspot_encode_norm(
    num_terms, ln_min: int = 1, ln_max: int = 1, steepness: float = 0.5
) -> np.ndarray:
    """floatToByte315(computeLengthNorm(numTokens)) with fieldBoost = 1 —
    the index-time norm byte an index built under SweetSpotSimilarity stores
    (SweetSpotSimilarity.java:107-117 lengthNorm)."""
    return float_to_byte315(sweetspot_length_norm(num_terms, ln_min, ln_max, steepness))


def sweetspot_norm_ranges(
    ln_min: int = 1,
    ln_max: int = 1,
    steepness: float = 0.5,
    max_dl: int = 1 << 40,
) -> list[tuple[int, int, float]]:
    """(dl_lo, dl_hi, decoded_norm) integer range table for SweetSpot norms.

    decoded_norm = byte315ToFloat(floatToByte315(computeLengthNorm(dl))) — the
    lossy value a SweetSpot-built index would decode at search time.  Unlike
    the BM25/classic 1/sqrt(dl) encoding this function is NOT monotone (it
    rises to the [min, max] plateau then falls), so ranges up to ``ln_max``
    are enumerated directly and the monotone non-increasing tail past the
    plateau is binary-searched like norm_byte_dl_ranges.  Emitting ranges
    lets both engines (broadcast range join / DuckDB VALUES CTE) reproduce
    the quantization with pure integer BETWEEN lookups.
    """

    def decoded(dl: int) -> float:
        b = int(sweetspot_encode_norm(dl, ln_min, ln_max, steepness)[0])
        return float(np.ravel(byte315_to_float(b))[0])

    ranges: list[tuple[int, int, float]] = []
    # head: dl = 0 .. ln_max enumerated (plateau end), run-length compressed
    run_lo, run_v = 0, decoded(0)
    for dl in range(1, min(ln_max, max_dl) + 1):
        v = decoded(dl)
        if v != run_v:
            ranges.append((run_lo, dl - 1, run_v))
            run_lo, run_v = dl, v
    # tail: monotone non-increasing past the plateau
    dl = min(ln_max, max_dl) + 1
    while dl <= max_dl:
        v = decoded(dl)
        if v != run_v:
            ranges.append((run_lo, dl - 1, run_v))
            run_lo, run_v = dl, v
        b = int(sweetspot_encode_norm(dl, ln_min, ln_max, steepness)[0])
        if b <= 1:  # byte 1 covers every longer document
            break
        # largest hi with the same decoded value (encode monotone non-incr here)
        lo, hi = dl, max_dl
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if int(sweetspot_encode_norm(mid, ln_min, ln_max, steepness)[0]) >= b:
                lo = mid
            else:
                hi = mid - 1
        dl = lo + 1
    ranges.append((run_lo, max_dl, run_v))
    return ranges


def norm_byte_dl_ranges(max_dl: int = 1 << 40) -> list[tuple[int, int, int, float]]:
    """Integer breakpoint table: (dl_lo, dl_hi, norm_byte, decoded_len).

    encode_norm(dl) is monotone non-increasing in dl, so each norm byte owns a
    contiguous integer range of document lengths.  Emitting the ranges lets an
    external SQL engine (the DuckDB oracle) reproduce Lucene's lossy norm
    quantization with pure integer BETWEEN lookups — no float ops, no
    cross-engine rounding risk.  Bytes are found by solving the float32
    boundaries analytically and refining with the exact numpy encoder.
    """
    ranges: list[tuple[int, int, int, float]] = []
    dl = 1
    while dl <= max_dl:
        b = int(encode_norm(dl)[0])
        if b <= 1:  # byte 1 covers every longer document, up to +inf length
            ranges.append((dl, max_dl, b, float(NORM_TABLE[b])))
            break
        # Binary-search the largest hi <= max_dl with encode(hi) == b.
        # encode is monotone non-increasing in dl, so the predicate
        # encode(x) >= b is monotone (true then false) in x.
        lo, hi = dl, max_dl
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if int(encode_norm(mid)[0]) >= b:
                lo = mid
            else:
                hi = mid - 1
        ranges.append((dl, lo, b, float(NORM_TABLE[b])))
        dl = lo + 1
    return ranges
