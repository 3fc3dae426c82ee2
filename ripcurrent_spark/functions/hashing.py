"""Portable deterministic hashing.

Both Spark and DuckDB expose md5 over strings with identical results,
so a 32-bit integer hash derived from the md5 hex prefix is bit-stable
across the engine and the oracle — the foundation for deterministic
masking (blur noise, pseudonym selection) and for MinHash/SimHash/LSH
signatures whose correctness gate runs on DuckDB.

Spark side:   conv(substr(md5(x), 1, 8), 16, 10)::long
DuckDB side:  CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)

Seeded variants prepend ``<seed>:`` to the input. All values are in
[0, 2^32) — non-negative, so ``%`` behaves identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column | str, seed: str | None = None) -> Column:
    """32-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str, seed: str | None = None) -> str:
    """The same hash as :func:`h32`, in DuckDB SQL."""
    e = f"concat('{seed}:', {expr})" if seed is not None else expr
    return f"CAST('0x' || substr(md5({e}), 1, 8) AS BIGINT)"
