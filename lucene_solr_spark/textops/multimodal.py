"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads ride as ``binary`` columns next to typed metadata,
exactly like the ``html:binary`` column of the pages table.  The Spark-side
plumbing — schemas, Arrow batch shapes, ``mapInPandas`` signatures, partition
behavior — is real and tested; the actual codec step is STUBBED because this
container ships no image/audio libraries: ``mode='fake'`` produces
deterministic md5-derived pseudo-decodes (oracle-reproducible), ``mode='real'``
raises NotImplementedError at the single point where PIL/ffmpeg would slot in.

Scale shape: decode is embarrassingly parallel mapInPandas over the media
column only (column pruning keeps text/html out of the scan); frame sampling
explodes rows but stays map-side; feature vectors land as array<float>
columns feeding the similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "url string, n_bytes int, width int, height int, format string, "
    "features array<float>"
)

FRAME_SCHEMA = "url string, frame_idx int, frame_sha string"


def media_metadata(df: DataFrame, binary_col: str = "html", key_col: str = "url") -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions:
    (key, n_bytes, sha, magic8 = first 8 bytes hex)."""
    b = F.col(binary_col)
    return df.select(
        F.col(key_col).alias("url"),
        F.length(b).cast("int").alias("n_bytes"),
        F.md5(b).alias("sha"),
        F.lower(F.hex(F.substring(b, 1, 8))).alias("magic8"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str, list[float]]:
    """Deterministic pseudo-decode (STUB): dimensions and a 4-float feature
    vector derived from the md5 digest.  Replace with a real codec when the
    runtime ships one."""
    dig = hashlib.md5(payload).digest()
    width = 320 + int.from_bytes(dig[0:2], "big") % 1600
    height = 240 + int.from_bytes(dig[2:4], "big") % 840
    fmt = ["png", "jpeg", "webp", "gif"][dig[4] % 4]
    feats = [
        round(int.from_bytes(dig[4 * i : 4 * i + 4], "big") / 2**32, 6)
        for i in range(4)
    ]
    return width, height, fmt, feats


def decode_media(
    df: DataFrame,
    binary_col: str = "html",
    key_col: str = "url",
    mode: str = "fake",
) -> DataFrame:
    """mapInPandas decode: (url, n_bytes, width, height, format, features).

    The Arrow batch plumbing is production-shaped; only the inner per-payload
    decode is stubbed (see module docstring)."""
    if mode == "real":
        raise NotImplementedError(
            "real media decoding requires an image/audio codec library "
            "(PIL / torchvision / ffmpeg) not present in this runtime; "
            "use mode='fake' for the deterministic stub"
        )
    if mode != "fake":
        raise ValueError(f"unknown decode mode: {mode!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                # NULL binary cells arrive as None — a crawl row without a
                # payload must not fail the task; skip it (decode emits
                # nothing for undecodable rows)
                if payload is None:
                    continue
                data = bytes(payload)
                w, h, fmt, feats = _fake_decode(data)
                rows.append((key, len(data), w, h, fmt, feats))
            yield pd.DataFrame(
                rows,
                columns=["url", "n_bytes", "width", "height", "format", "features"],
            )

    return df.select(key_col, binary_col).mapInPandas(decode, DECODE_SCHEMA)


def sample_frames(
    df: DataFrame,
    binary_col: str = "html",
    key_col: str = "url",
    n_frames: int = 3,
    mode: str = "fake",
) -> DataFrame:
    """Frame-sampling stub: one output row per sampled frame with a
    deterministic content id — the row-explosion shape of video pipelines."""
    if mode == "real":
        raise NotImplementedError("real frame extraction needs ffmpeg; use mode='fake'")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                if payload is None:  # no payload -> no frames, not a crash
                    continue
                data = bytes(payload)
                for i in range(n_frames):
                    sha = hashlib.md5(data + f"|frame{i}".encode()).hexdigest()
                    rows.append((key, i, sha))
            yield pd.DataFrame(rows, columns=["url", "frame_idx", "frame_sha"])

    return df.select(key_col, binary_col).mapInPandas(sample, FRAME_SCHEMA)
