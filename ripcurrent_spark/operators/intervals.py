"""Bucketed range join: pair events within a bounded time window.

A naive range join (`a.ts BETWEEN b.ts - w AND b.ts`) on two big
fact tables forces a broadcast-nested-loop or a per-key sort-merge
with quadratic blowup on hot keys. The scalable form for a BOUNDED
window `w` quantizes time into width-`w` buckets: a left row in
bucket `b` can only match right rows whose own bucket is `b` or
`b-1` — equivalently, exploding each RIGHT row into buckets `b` and
`b+1` (constant fanout of 2) turns the range
join into an equi-join on (key, bucket) + a residual range filter —
one shuffle, AQE-skew-splittable, linear in input size.

This is the batch twin of a stream-stream interval join
(`leftTs BETWEEN rightTs - w AND rightTs` with watermarks), and the
generalization the reference's CDC engine lacks but a training-data
pipeline needs (click attribution, nearby-frame pairing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.functions.timeutil import epoch_seconds


def range_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
) -> DataFrame:
    """All (left, right) pairs with the same `key` and
    ``right_ts in (left_ts - window, left_ts]``.

    Column names must be disjoint apart from `key`. The right side is
    exploded to its own bucket and the next one (fanout exactly 2);
    the join is a plain equi-join on (key, bucket).
    """
    lb = F.floor(epoch_seconds(left, left_ts) / window_sec)
    rb = F.floor(epoch_seconds(right, right_ts) / window_sec)
    l = left.withColumn("__b", lb)
    r = right.withColumn("__b", F.explode(F.array(rb, rb + 1)))
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("l.__b") == F.col("r.__b"))
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
            & (
                F.col(f"r.{right_ts}")
                > F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {window_sec} SECONDS")
            ),
            "inner",
        )
        .drop(F.col("l.__b"))
        .drop(F.col("r.__b"))
        .drop(F.col(f"r.{key}"))
    )


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_sec: int,
) -> DataFrame:
    """All (left, right) pairs with the same `key` and
    ``|right_ts - left_ts| <= window`` (inclusive both ends) — the
    symmetric sibling of :func:`range_join_backward` for
    nearest-in-time matching. The right side explodes to its own
    bucket and both neighbors (fanout exactly 3; bucket width =
    window, so every in-range partner lands in one of the three); the
    join stays a plain equi-join on (key, bucket). Column names must
    be disjoint apart from `key`."""
    lb = F.floor(epoch_seconds(left, left_ts) / window_sec)
    rb = F.floor(epoch_seconds(right, right_ts) / window_sec)
    l = left.withColumn("__b", lb)
    r = right.withColumn("__b", F.explode(F.array(rb - 1, rb, rb + 1)))
    w = F.expr(f"INTERVAL {window_sec} SECONDS")
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col("l.__b") == F.col("r.__b"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - w)
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + w),
            "inner",
        )
        .drop(F.col("l.__b"))
        .drop(F.col("r.__b"))
        .drop(F.col(f"r.{key}"))
    )
