"""Bit-exactness tests for the SmallFloat norm quantization port.

Golden values computed by hand from the Lucene 4.10.5 algorithm
(SmallFloat.java:78-98): floatToByte315 truncates a float32 to a 3-bit
mantissa / 5-bit-exponent byte with zeroExp=15.
"""

import numpy as np
import struct

from lucene_solr_spark.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    decoded_doc_len,
    encode_norm,
    float_to_byte315,
    norm_byte_dl_ranges,
)


def _java_float_to_byte315(f: float) -> int:
    """Direct scalar transliteration of the published algorithm (oracle)."""
    bits = struct.unpack(">i", struct.pack(">f", np.float32(f)))[0]
    smallfloat = bits >> 21
    fzero = (63 - 15) << 3
    if smallfloat <= fzero:
        return 0 if bits <= 0 else 1
    if smallfloat >= fzero + 0x100:
        return 255
    return smallfloat - fzero


def _java_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = (b & 0xFF) << 21
    bits += (63 - 15) << 24
    return struct.unpack(">f", struct.pack(">i", np.int32(bits)))[0]


def test_roundtrip_against_scalar_oracle():
    vals = np.concatenate(
        [
            np.array([0.0, 1.0, 0.5, 0.25, 1e-10, 1e10], dtype=np.float32),
            np.float32(1.0) / np.sqrt(np.arange(1, 5000, dtype=np.float64)).astype(np.float32),
            np.random.RandomState(42).uniform(0, 2, 1000).astype(np.float32),
        ]
    )
    got = float_to_byte315(vals)
    want = np.array([_java_float_to_byte315(v) for v in vals])
    np.testing.assert_array_equal(got, want)


def test_decode_against_scalar_oracle():
    got = byte315_to_float(np.arange(256))
    want = np.array([_java_byte315_to_float(b) for b in range(256)], dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_known_values():
    # 1.0f -> bits 0x3F800000 >> 21 = 0x1FC = 508; 508-384 = 124
    assert int(float_to_byte315(np.float32(1.0))[0]) == 124
    assert int(float_to_byte315(np.float32(0.0))[0]) == 0
    assert int(float_to_byte315(np.float32(np.inf))[0]) == 255
    # decode(124) == 1.0 exactly
    assert float(byte315_to_float(124)[0]) == 1.0
    # NORM_TABLE[124] == 1.0 (doc length 1 survives quantization exactly)
    assert float(NORM_TABLE[124]) == 1.0


def test_encode_norm_monotone_and_exact():
    dls = np.arange(1, 200_000)
    enc = encode_norm(dls)
    # monotone non-increasing
    assert (np.diff(enc.astype(np.int64)) <= 0).all()
    # spot-check against the scalar oracle path
    for dl in [1, 2, 3, 4, 7, 8, 100, 255, 256, 4096, 65536, 199_999]:
        f = np.float32(1.0) / np.float32(np.sqrt(float(dl)))
        assert int(encode_norm(dl)[0]) == _java_float_to_byte315(f)


def test_norm_byte_dl_ranges_cover_exhaustively():
    max_dl = 1_000_000
    ranges = norm_byte_dl_ranges(max_dl)
    # contiguous cover of [1, max_dl]
    assert ranges[0][0] == 1
    assert ranges[-1][1] == max_dl
    for (a_lo, a_hi, _, _), (b_lo, _, _, _) in zip(ranges, ranges[1:]):
        assert b_lo == a_hi + 1
    # exact agreement with the encoder on every dl up to 100k + boundaries
    dls = np.arange(1, 100_001)
    enc = encode_norm(dls).astype(np.int64)
    lookup = np.zeros(100_001, dtype=np.int64)
    for lo, hi, b, _ in ranges:
        if lo > 100_000:
            break
        lookup[lo : min(hi, 100_000) + 1] = b
    np.testing.assert_array_equal(enc, lookup[1:])
    # boundary dls around each range edge agree too
    for lo, hi, b, dl_approx in ranges[:60]:
        assert int(encode_norm(lo)[0]) == b
        assert int(encode_norm(hi)[0]) == b
        assert dl_approx == float(decoded_doc_len(b))
