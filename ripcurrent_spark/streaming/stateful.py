"""Arbitrary stateful processing via transformWithStateInPandas
(the successor API to applyInPandasWithState: named state variables,
TTL, timers, initial state).

`running_user_totals` maintains one ValueState row per key (event
count + value sum) and emits the updated running totals every
micro-batch — the incremental form of a lifetime-aggregate table,
O(keys) state, no reprocessing. A TTL (optional) bounds state for
keys that go quiet — the piece applyInPandasWithState lacks natively.

Environment note: the transformWithState protocol requires
google.protobuf at runtime. On images without the wheel, the session
factory installs the vendored minimal proto3 runtime
(ripcurrent_spark/_vendor via protoshim.ensure_protobuf) before the
JVM starts, so the e2e runs everywhere. Requires the RocksDB state
store provider (named state variables = column families).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, tv double"


def _make_processor(ttl_ms: int | None):
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA, ttl_ms)

        def handleInputRows(
            self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
        ) -> Iterator["pd.DataFrame"]:
            n, tv = (self._totals.get() if self._totals.exists() else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                tv += float(pdf["value"].sum())
            self._totals.update((n, tv))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [tv]}
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def running_user_totals(
    events: DataFrame, key_col: str = "user_id", ttl_ms: int | None = None
) -> DataFrame:
    """Per-key running (count, sum) over a stream, emitted as updates."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_make_processor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


CATEGORY_OUTPUT_SCHEMA = "user_id long, event_type string, n long"


def _make_category_processor():
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CategoryCounts(StatefulProcessor):
        """MapState: per-key map<event_type, count>, re-emitting the
        key's FULL category histogram every batch the key appears in —
        the streaming twin of groupBy(key, type).count() but with
        O(keys x types) state and update-only output."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "cat_counts", "event_type string", "n long"
            )

        def handleInputRows(
            self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
        ) -> Iterator["pd.DataFrame"]:
            for pdf in rows:
                for etype, cnt in pdf["event_type"].value_counts().items():
                    k = (etype,)
                    prev = self._counts.getValue(k) if self._counts.containsKey(k) else (0,)
                    self._counts.updateValue(k, (prev[0] + int(cnt),))
            types, counts = [], []
            for (etype,), (n,) in self._counts.iterator():
                types.append(etype)
                counts.append(n)
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(types), "event_type": types, "n": counts}
            )

        def close(self) -> None:
            pass

    return CategoryCounts()


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long, "
    "n_events long, total_value double"
)
_SESSION_STATE_SCHEMA = "start_ms long, last_ms long, n long, tv double"


def _make_timer_session_processor(gap_ms: int):
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TimerSessions(StatefulProcessor):
        """Gap sessionization with EVENT-TIME TIMERS: each batch merges
        the key's rows (splitting on in-batch gaps and emitting the
        closed ones immediately), keeps the trailing open session in
        ValueState, and re-arms one timer at last_ts + gap. When the
        watermark passes the timer, handleExpiredTimer emits the held
        session and clears state — the session closes even if the key
        never appears again, which the batch-driven
        applyInPandasWithState sessionizer cannot do without traffic.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("sess", _SESSION_STATE_SCHEMA)

        def _emit(self, key: Any, s) -> "pd.DataFrame":
            start, last, n, tv = s
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_ms": [start],
                    "session_end_ms": [last],
                    "n_events": [n],
                    "total_value": [tv],
                }
            )

        def handleInputRows(
            self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
        ) -> Iterator["pd.DataFrame"]:
            batch = pd.concat(list(rows))
            batch = batch.assign(
                _ms=batch["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
            ).sort_values("_ms")
            # sessions within this batch: split where gap > gap_ms,
            # values attributed per row to the span they fall in
            spans: list[tuple[int, int, int, float]] = []
            cur = self._sess.get() if self._sess.exists() else None
            for ms, val in zip(batch["_ms"], batch["value"].astype(float)):
                if cur is not None and ms - cur[1] <= gap_ms:
                    cur = (cur[0], int(ms), cur[2] + 1, cur[3] + val)
                else:
                    if cur is not None:
                        spans.append(cur)
                    cur = (int(ms), int(ms), 1, val)
            for s in spans:
                yield self._emit(key, s)
            # hold the open trailing session + one armed timer
            self._sess.update(cur)
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(cur[1] + gap_ms)

        def handleExpiredTimer(
            self, key: Any, timerValues: Any, expiredTimerInfo: Any
        ) -> Iterator["pd.DataFrame"]:
            if self._sess.exists():
                s = self._sess.get()
                self._sess.clear()
                yield self._emit(key, s)

        def close(self) -> None:
            pass

    return TimerSessions()


def sessionize_with_timers(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap sessionization via transformWithState event-time timers.

    State: one (start, last, n, total) tuple + one armed timer per
    key — O(keys), watermark-driven eviction. The timer is the piece
    session_window gives natively and applyInPandasWithState lacks:
    sessions close on TIME passing, not on the next batch containing
    the key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_make_timer_session_processor(gap_sec * 1000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def running_category_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key per-category running counts via MapState (user-keyed
    map<event_type,long>), emitted as updates. Exercises the MapState
    protocol surface: containsKey / getValue / updateValue / iterator."""
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_make_category_processor(),
        outputStructType=CATEGORY_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
