"""CDC apply semantics: changelog -> target state.

The reference routes each event to a generated per-(table, op) SortCL
job: append for inserts, ``/UPDATE=(key)`` for updates, ``/DELETE=
(key)`` for deletes (Main.java:456-498). Spark-first, the same
semantics are ONE declarative plan over the whole changelog:

- snapshot  = latest event per key (single shuffle on the key), drop
  keys whose latest op is a delete;
- SCD2      = every non-delete event becomes a validity interval
  [ts, next-event ts) via one window pass.

At 100 TB the shuffle on the key is the only data movement; AQE
handles skewed hot keys, and the streaming twin (cdc/pipeline.py)
maintains the same snapshot incrementally per micro-batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def latest_snapshot(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms", "seq"),
    op_col: str = "op",
) -> DataFrame:
    """Apply c/u/d events: keep the latest event per key (ordered by
    ``order_cols``), drop keys whose latest event is a delete."""
    w = W.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "d"))
        .drop("_rn")
    )


def scd2_history(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms", "seq"),
    op_col: str = "op",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Slowly-changing-dimension type 2: each non-delete event becomes
    a version with [valid_from, valid_to) in the ``ts_col`` domain;
    open intervals (valid_to NULL) are current. A delete closes the
    last interval without emitting a row."""
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    with_next = changelog.withColumn("_next_ts", F.lead(F.col(ts_col)).over(w))
    return (
        with_next.filter(F.col(op_col) != "d")
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.col("_next_ts"))
        .withColumn("is_current", F.col("_next_ts").isNull())
        .drop("_next_ts")
    )


def changelog_counts(changelog: DataFrame, op_col: str = "op", table_col: str | None = None) -> DataFrame:
    """Replication audit: event counts + ts range per (table,) op."""
    keys = ([table_col] if table_col else []) + [op_col]
    return changelog.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("min_ts_ms"),
        F.max("ts_ms").alias("max_ts_ms"),
    )
