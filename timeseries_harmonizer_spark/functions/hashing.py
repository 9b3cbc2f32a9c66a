"""Portable 64-bit hash: the lower 64 bits of md5, little-endian, masked
to 63 bits — computable identically in Spark (this Column expression) and
DuckDB (``md5_number_lower(x) & 9223372036854775807``), so oracle queries
can recompute hash-derived values exactly. The production fast path stays
xxhash64 (JVM, no hex round-trip); this family exists for verifiability
(q34 simhash, q38 synthetic media) where a cross-engine replica matters.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_lower64_masked(c: Column | str) -> Column:
    """Spark replica of DuckDB ``md5_number_lower(x) & 0x7fff...``: the md5
    digest's last 8 bytes read little-endian = hex pairs 31..17 reversed,
    sign bit cleared."""
    h = F.md5(c)
    le = F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(le, 16, -10).cast("long").bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
