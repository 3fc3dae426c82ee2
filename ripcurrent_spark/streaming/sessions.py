"""Streaming sessionization: native session_window aggregation and a
custom stateful operator (applyInPandasWithState).

Two scale postures:
- `session_window_agg` — Spark's built-in gap-merged session windows
  (state store managed by the engine, watermark-driven eviction).
  Preferred whenever the aggregate is expressible as built-ins.
- `sessionize_stateful` — explicit per-key state over
  applyInPandasWithState, for session logic built-ins can't express
  (custom close conditions, per-session payloads). Arrow-batched; one
  state row per key; emits a session only when it CLOSES (gap
  exceeded), so downstream sees each session exactly once.

Batch twin: queries/relational.py::q_sessionize_events (lag + running
flag sum) computes identical sessions over static data — the
streaming operators are its incremental forms.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# Per-key state: timestamps as epoch microseconds (long) — Arrow-stable.
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session aggregate via the native session_window.

    On a stream, append mode emits a session once the watermark passes
    its close; state eviction is automatic — this is the 100 TB path
    (engine-managed incremental merge, no per-key Python)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("double")).alias("total_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sessionize_stateful(
    events: DataFrame,
    gap_sec: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful sessionizer over applyInPandasWithState.

    State = the one open session per key (start, last-seen, count,
    value sum). Each micro-batch merges its events in time order; a
    gap > gap_sec CLOSES the current session (emitted downstream) and
    opens a new one. The final open session stays in state — exactly
    the semantics of an incremental, per-key fold, with O(keys) state
    regardless of stream length.

    Assumes per-key event-time order across batches (enforce upstream
    with a watermark + sort within trigger if the source can reorder).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        parts = [p[[ts_col, value_col]] for p in pdfs]
        closed: list[tuple] = []
        cur = state.get if state.exists else None  # (start_us, last_us, n, tv)
        if parts:
            batch = pd.concat(parts).sort_values(ts_col)
            ts_us = (batch[ts_col].astype("int64") // 1000).to_numpy()  # ns -> us
            vals = batch[value_col].to_numpy(dtype="float64")
            for t_us, v in zip(ts_us, vals):
                t_us = int(t_us)
                if cur is None:
                    cur = (t_us, t_us, 1, float(v))
                elif t_us - cur[1] > gap_sec * 1_000_000:
                    closed.append(cur)
                    cur = (t_us, t_us, 1, float(v))
                else:
                    cur = (cur[0], t_us, cur[2] + 1, cur[3] + float(v))
        if cur is not None:
            state.update(cur)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
