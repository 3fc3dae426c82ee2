"""Streaming sessionization: native session_window (append mode,
watermark-finalized) and the custom applyInPandasWithState operator.

Fixture: two trigger files (maxFilesPerTrigger=1). Batch 2 carries a
far-future event so (a) the watermark passes batch-1 sessions for the
native path and (b) the gap closes batch-1 sessions for the stateful
path — both must then emit identical closed sessions.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timedelta

import pytest

from ripcurrent_spark.streaming.sessions import (
    session_window_agg,
    sessionize_stateful,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(minutes: float, user: int, value: float) -> dict:
    return {
        "ts": (T0 + timedelta(minutes=minutes)).strftime("%Y-%m-%d %H:%M:%S"),
        "user_id": user,
        "value": value,
    }


# user 1: two sessions (gap 40min > 30min); user 2: one session.
BATCH1 = [
    _ev(0, 1, 1.0),
    _ev(10, 1, 2.0),
    _ev(50, 1, 4.0),
    _ev(55, 1, 8.0),
    _ev(5, 2, 16.0),
]
# Far-future events: advance watermark + close all batch-1 sessions.
BATCH2 = [_ev(24 * 60, 1, 32.0), _ev(24 * 60, 2, 64.0)]


def _write_batches(src, batches):
    """One file per trigger; file-source batch order follows mod time,
    so pin strictly increasing mtimes (same-second writes tie and can
    reorder triggers)."""
    src.mkdir()
    now = time.time()
    for i, batch in enumerate(batches):
        p = src / f"{i:03d}.json"
        with open(p, "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")
        os.utime(p, (now - 100 + 10 * i, now - 100 + 10 * i))


@pytest.fixture()
def stream_dir(tmp_path):
    _write_batches(tmp_path / "src", [BATCH1, BATCH2])
    return tmp_path


def _read_stream(spark, src):
    return (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )


def _run_to_memory(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


EXPECTED_CLOSED = {
    # (user_id, start_min, end_min, n_events, total_value)
    (1, 0, 10, 2, 3.0),
    (1, 50, 55, 2, 12.0),
    (2, 5, 5, 1, 16.0),
}


def _row_key(r):
    start_min = int((r.session_start - T0).total_seconds() // 60)
    end_min = int((r.session_end - T0).total_seconds() // 60)
    return (r.user_id, start_min, end_min, r.n_events, float(r.total_value))


def test_sessionize_stateful_emits_closed_sessions(spark, stream_dir):
    src = stream_dir / "src"
    out = sessionize_stateful(_read_stream(spark, src), gap_sec=1800)
    got = _run_to_memory(spark, out, "sess_stateful")
    rows = got.collect()
    assert {_row_key(r) for r in rows} == EXPECTED_CLOSED


def test_session_window_agg_append_finalizes_on_watermark(spark, stream_dir):
    src = stream_dir / "src"
    out = session_window_agg(
        _read_stream(spark, src), gap="30 minutes", watermark="1 hour"
    )
    got = _run_to_memory(spark, out, "sess_native")
    rows = got.collect()
    # session_window end = last_event + gap; normalize to last-event time.
    seen = {
        (
            r.user_id,
            int((r.session_start - T0).total_seconds() // 60),
            int((r.session_end - timedelta(minutes=30) - T0).total_seconds() // 60),
            r.n_events,
            float(r.total_value),
        )
        for r in rows
    }
    assert EXPECTED_CLOSED <= seen


def test_stateful_batch_boundary_does_not_split_sessions(spark, tmp_path):
    # The same session spanning two triggers must merge via state.
    src = tmp_path / "src2"
    _write_batches(
        src,
        [
            [_ev(0, 7, 1.0)],
            [_ev(10, 7, 2.0), _ev(10 * 60, 7, 4.0)],  # merges, then closes
        ],
    )
    out = sessionize_stateful(_read_stream(spark, src), gap_sec=1800)
    got = _run_to_memory(spark, out, "sess_span")
    rows = got.collect()
    assert {_row_key(r) for r in rows} == {(7, 0, 10, 2, 3.0)}


def test_session_window_late_data_no_duplicate_emission(spark, tmp_path):
    """The watermark contract Spark actually guarantees: a session is
    emitted exactly ONCE, finalized — a ~24h-late replay must never
    produce a second/updated output row for the same session. (Strict
    DROPPING of late rows is best-effort, not guaranteed: if session
    state has not yet been evicted the late row may still merge, so
    this test pins emission uniqueness, not the merge.)"""
    src = tmp_path / "late"
    _write_batches(
        src,
        [
            [_ev(0, 1, 1.0), _ev(5, 1, 2.0), _ev(24 * 60, 9, 4.0)],
            [_ev(6, 1, 8.0), _ev(25 * 60, 9, 16.0)],  # _ev(6,...) is ~24h late
        ],
    )
    out = session_window_agg(
        _read_stream(spark, src), gap="30 minutes", watermark="1 hour"
    )
    got = _run_to_memory(spark, out, "sess_late")
    u1 = [r for r in got.collect() if r.user_id == 1]
    assert len(u1) == 1  # one finalized session row, never re-emitted
    assert u1[0].n_events in (2, 3)  # late merge allowed, duplication not


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas keeps named per-key state across
    micro-batches: totals emitted in batch 2 must include batch 1.

    The API's state-server protocol needs google.protobuf; on images
    without the wheel the vendored minimal runtime
    (ripcurrent_spark/_vendor) backs the generated pb2 module — the
    session factory installs it before the JVM starts, so this e2e now
    runs everywhere."""
    from ripcurrent_spark.protoshim import ensure_protobuf

    ensure_protobuf()
    from ripcurrent_spark.streaming.stateful import running_user_totals

    # transformWithState keeps each named state variable in its own
    # column family — only the RocksDB provider supports that.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    try:
        src = tmp_path / "tws"
        _write_batches(
            src,
            [
                [_ev(0, 1, 1.0), _ev(1, 2, 2.0)],
                [_ev(2, 1, 4.0), _ev(3, 1, 8.0)],
            ],
        )
        out = running_user_totals(_read_stream(spark, src))
        q = (
            out.writeStream.format("memory").queryName("tws_totals")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    rows = spark.table("tws_totals").collect()
    # final (largest) emission per user carries the lifetime totals
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, float(r.total_value))
    assert final[1] == (3, 13.0)
    assert final[2] == (1, 2.0)


def test_transform_with_state_map_state_category_counts(spark, tmp_path):
    """MapState keeps a per-key map<event_type,count> across batches;
    the emitted histogram after batch 2 includes batch-1 counts, and
    categories untouched in a batch are still re-emitted (full-map
    iterator)."""
    from ripcurrent_spark.protoshim import ensure_protobuf

    ensure_protobuf()
    from ripcurrent_spark.streaming.stateful import running_category_counts

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "tws_map"
        _write_batches(
            src,
            [
                [
                    {**_ev(0, 1, 1.0), "event_type": "click"},
                    {**_ev(1, 1, 1.0), "event_type": "view"},
                    {**_ev(2, 2, 1.0), "event_type": "click"},
                ],
                [
                    {**_ev(3, 1, 1.0), "event_type": "click"},
                ],
            ],
        )
        stream = (
            spark.readStream.schema(
                "ts timestamp, user_id long, value double, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        out = running_category_counts(stream)
        q = (
            out.writeStream.format("memory").queryName("tws_cats")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    rows = spark.table("tws_cats").collect()
    # keep the final (max) count seen per (user, type)
    final = {}
    for r in rows:
        k = (r.user_id, r.event_type)
        final[k] = max(final.get(k, 0), r.n)
    assert final[(1, "click")] == 2  # batch1 + batch2
    assert final[(1, "view")] == 1  # untouched in batch2 but re-emitted
    assert final[(2, "click")] == 1


def test_transform_with_state_event_time_timers(spark, tmp_path):
    """Event-time timers close sessions when the WATERMARK passes
    last_event + gap — no further traffic for the key needed. Batch 1
    opens sessions for users 1 and 2 (user 1's in-batch gap splits into
    a closed session + an open one); batch 2's far-future event
    advances the watermark so the armed timers fire and emit the held
    sessions via handleExpiredTimer."""
    from ripcurrent_spark.protoshim import ensure_protobuf

    ensure_protobuf()
    from ripcurrent_spark.streaming.stateful import sessionize_with_timers

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "tws_timers"
        _write_batches(
            src,
            [
                # user 1: minutes 0,5 then 50,55 (45-min gap splits);
                # user 2: minute 1
                [_ev(0, 1, 1.0), _ev(5, 1, 2.0), _ev(50, 1, 4.0),
                 _ev(55, 1, 8.0), _ev(1, 2, 16.0)],
                # +25h: watermark (1h lag) passes every armed timer
                [_ev(25 * 60, 9, 32.0)],
            ],
        )
        out = sessionize_with_timers(_read_stream(spark, src), gap_sec=1800)
        q = (
            out.writeStream.format("memory").queryName("tws_timer_sessions")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    rows = spark.table("tws_timer_sessions").collect()
    got = {
        (r.user_id, int(r.session_start_ms // 60000), int(r.session_end_ms // 60000), r.n_events)
        for r in rows
    }
    totals = {
        (r.user_id, int(r.session_start_ms // 60000)): float(r.total_value) for r in rows
    }
    t0_min = int(T0.timestamp()) // 60
    # user 1: split session (0-5, 2 events) emitted in-batch; trailing
    # (50-55, 2 events) and user 2's (1-1, 1 event) fired by timers.
    assert (1, t0_min + 0, t0_min + 5, 2) in got
    assert (1, t0_min + 50, t0_min + 55, 2) in got
    assert (2, t0_min + 1, t0_min + 1, 1) in got
    # per-row value attribution: each span carries ITS rows' values
    assert totals[(1, t0_min + 0)] == 3.0  # 1.0 + 2.0
    assert totals[(1, t0_min + 50)] == 12.0  # 4.0 + 8.0
    assert totals[(2, t0_min + 1)] == 16.0
    # user 9's session stays open (nothing advanced the watermark past
    # it) — exactly-once emission, nothing duplicated
    assert len([r for r in rows if r.user_id == 1]) == 2
    assert len([r for r in rows if r.user_id == 9]) == 0
