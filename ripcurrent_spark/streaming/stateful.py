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
