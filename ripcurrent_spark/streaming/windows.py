"""Watermarked windowed aggregation over event streams.

The streaming twin of the batch `q_time_bucket_events` /
`q_sliding_window_events` queries: tumbling or hopping event-time
windows with a watermark, aggregated in the engine's state store. In
append mode a window row is emitted exactly once — when the
watermark passes its end — which is what downstream consumers
(rollup tables, alerting) want: finalized totals, not retractions.

Scale posture: state is one row per (window, group) key; the
watermark bounds it by evicting closed windows, so state size is
(windows in flight) x (group cardinality), independent of stream
length. Late rows inside the watermark merge into open state;
later ones are dropped by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(win_start, win_end, <group>, n, total_value) per finalized
    window; pass `slide` for hopping windows (each event lands in
    window/slide buckets, constant fanout like the batch twin)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            group_col,
            "n",
            "total_value",
        )
    )
