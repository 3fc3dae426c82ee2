"""Timezone-independent epoch arithmetic over timestamp columns.

Parquet timestamps written without ``isAdjustedToUTC`` read back as
TIMESTAMP_NTZ in Spark 4 (``spark.sql.parquet.inferTimestampNTZ.enabled``
defaults to true), and NTZ admits no direct cast to BIGINT.  DuckDB
reads the same column as a naive timestamp and ``epoch()`` treats the
wall clock as UTC, so the portable mapping is wall-clock-as-UTC —
which is what ``timestamp_diff`` against an NTZ epoch literal
computes, with no dependence on the session timezone (a
``cast("timestamp")`` hop would shift by the session offset on
non-UTC drivers, silently changing bucket boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_ntz() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_expr(c: Column, dtype: str, unit: str = "SECOND") -> Column:
    """Epoch count of `unit` for a timestamp-like Column whose Spark
    dtype (``simpleString``) is `dtype`.  NTZ and DATE wall clocks are
    read as UTC; instant (LTZ) columns are already absolute."""
    if dtype in ("timestamp_ntz", "date"):
        return F.timestamp_diff(unit, _epoch_ntz(), c.cast("timestamp_ntz"))
    if unit == "SECOND":
        return c.cast("long")
    if unit == "MILLISECOND":
        return F.unix_millis(c)
    return F.unix_micros(c)


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Seconds since 1970-01-01 of ``df[col]``, tz-independent."""
    return epoch_expr(F.col(col), df.schema[col].dataType.simpleString())


def epoch_millis(df: DataFrame, col: str) -> Column:
    return epoch_expr(
        F.col(col), df.schema[col].dataType.simpleString(), "MILLISECOND"
    )
