"""Cross-engine portable 60-bit hash (Spark Column + DuckDB SQL renderers).

The correctness gate runs every operator side-by-side in Spark and DuckDB, so
any hash-partitioned / hash-sketched operator (doc routing, MinHash, SimHash,
sign-LSH) needs ONE hash function both engines compute bit-identically.  md5
is the portable primitive: take the first 15 hex digits (60 bits, always
non-negative in a signed 64-bit int).

At cluster scale the same operators would swap in ``xxhash64`` (Spark-native,
~20× faster, murmur-class quality — the reference routes docs with
murmurhash3, solr/solrj/.../CompositeIdRouter.java:46-55 and Hash.java:243);
every call site takes the hash as a pluggable expression, so the swap is a
one-line config, not a redesign.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK_BITS = 60


def hash64_col(col: Column) -> Column:
    """Spark: first 15 md5 hex digits of the UTF-8 bytes, as non-negative long."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL computing the identical value over a VARCHAR expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
