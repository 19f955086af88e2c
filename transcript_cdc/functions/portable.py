"""Portable 32-bit hash — identical in Spark, DuckDB and pure Python.

The near-dup/ANN family defaults to ``xxhash64`` (JVM-native, the 100TB
production path), but xxhash64 has no DuckDB twin, which left those
operators oracle-unverifiable (round-1 verdict item 4). This hash —
``int(md5(utf8(s))[:8], 16)`` — is computable bit-identically in all three
engines, so the driver-facing queries can run the SAME algorithm on both
sides of the correctness gate:

- Spark:  ``conv(substring(md5(s), 1, 8), 16, 10)`` cast to long
- DuckDB: ``CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)``
- Python: ``int(hashlib.md5(s.encode()).hexdigest()[:8], 16)``

Range is [0, 2^32) — non-negative, so ``%`` agrees across engines too.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash32(col: Column | str) -> Column:
    """Spark side of the portable hash (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB side — `expr` is a VARCHAR SQL expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def py_hash32(s: str) -> int:
    """Pure-Python twin (used to compute query-side constants that must
    match what Spark computes for row-side values)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def py_hash_embed(text: str, dim: int = 16) -> list[float]:
    """Python twin of functions.vectors.hash_embed(hash_fn='md5'):
    token → portable-hash bucket → L2-normalized counts. Must match the
    Spark expression bit-for-bit (same tokenization, same IEEE ops)."""
    import re

    toks = re.split(r"\s+", text.strip().lower()) if text.strip() else [""]
    counts = [0.0] * dim
    for w in toks:
        counts[py_hash32(w) % dim] += 1.0
    n = 0.0
    for v in counts:
        n += v * v
    n = n**0.5
    n = max(n, 1e-12)
    return [v / n for v in counts]
