"""Watermarked tumbling-window aggregation: append mode emits each
window exactly once (when the watermark passes its end), late rows
inside the watermark merge before finalization, and state does not
re-emit on later triggers."""

from __future__ import annotations

import json
import os
import time

from ripcurrent_spark.streaming.windows import windowed_counts

BASE = 1_700_000_000  # any stable epoch anchor


def _ev(ts_off: int, etype: str, value: float):
    return {"ts": BASE + ts_off, "event_type": etype, "value": value}


def _write(d, name, events, mtime):
    d.mkdir(parents=True, exist_ok=True)
    p = d / name
    with open(p, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.utime(p, (mtime, mtime))


def test_windowed_counts_finalize_once(spark, tmp_path):
    src = tmp_path / "ev"
    out = tmp_path / "out"
    t0 = time.time()
    # Window 0: [BASE, BASE+600). Two events now, one late-but-in-
    # watermark event in the second file, plus a far-future event that
    # pushes the watermark beyond window 0's end.
    _write(src, "b0.json", [_ev(10, "click", 1.0), _ev(20, "click", 2.0)], t0)

    stream = (
        spark.readStream.schema("ts long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .selectExpr("timestamp_seconds(ts) AS ts", "event_type", "value")
    )
    q = (
        windowed_counts(stream, window="10 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # Late row for window 0 (inside watermark) + watermark push.
    _write(src, "b1.json", [_ev(30, "click", 4.0), _ev(7200, "view", 1.0)], t0 + 2)
    q.processAllAvailable()
    # One more trigger: window 0 must NOT re-emit.
    _write(src, "b2.json", [_ev(7300, "view", 1.0)], t0 + 4)
    q.processAllAvailable()
    q.stop()

    rows = spark.read.parquet(str(out)).collect()
    w0 = [r for r in rows if r.win_start.timestamp() == BASE - BASE % 600]
    assert len(w0) == 1  # finalized exactly once
    assert w0[0].n == 3 and w0[0].total_value == 7.0  # late row merged
