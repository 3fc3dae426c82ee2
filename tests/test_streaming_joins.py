"""Stream-stream interval join + streaming deduplication.

The batch bucketed range join (operators/intervals.py) has a native
streaming twin: a watermarked stream-stream inner join with a
time-range condition. Streaming dedup is dropDuplicates on the
content hash with a watermark bounding state. Both are checked
against their batch equivalents on the same data.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(minutes: float, user: int, etype: str, eid: int) -> dict:
    return {
        "ts": (T0 + timedelta(minutes=minutes)).strftime("%Y-%m-%d %H:%M:%S"),
        "user_id": user,
        "event_type": etype,
        "event_id": eid,
    }


EVENTS = [
    _ev(0, 1, "click", 1),
    _ev(10, 1, "purchase", 2),   # pairs with click 1 (10 min gap)
    _ev(45, 1, "purchase", 3),   # 45 min after click 1 -> NO pair
    _ev(50, 1, "click", 4),
    _ev(55, 1, "purchase", 5),   # pairs with click 4
    _ev(5, 2, "click", 6),
    _ev(20, 2, "purchase", 7),   # pairs with click 6
    _ev(600, 9, "click", 99),    # watermark pusher
    _ev(600, 9, "purchase", 98),
]


def _write(src, batches):
    src.mkdir(parents=True)
    now = time.time()
    for i, batch in enumerate(batches):
        p = src / f"{i:03d}.json"
        with open(p, "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")
        os.utime(p, (now - 100 + 10 * i, now - 100 + 10 * i))


SCHEMA = "ts timestamp, user_id long, event_type string, event_id long"


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    _write(src, [EVENTS[:5], EVENTS[5:]])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 30 MINUTES"
        ),
    ).select("purchase_id", "click_id")
    q = (
        joined.writeStream.format("memory").queryName("ssj").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.purchase_id, r.click_id) for r in spark.table("ssj").collect()}
    assert {(2, 1), (5, 4), (7, 6)} <= got
    assert (3, 1) not in got  # outside the 30-minute window
    assert (98, 99) in got or (98, 99) not in got  # pusher pair irrelevant
    # exactness vs batch semantics on the same predicate:
    batch = spark.read.schema(SCHEMA).json(str(src))
    bp = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    bc = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts"))
    expected = {
        (r.purchase_id, r.click_id)
        for r in bp.join(
            bc,
            F.expr("p_user = c_user AND c_ts <= p_ts AND c_ts > p_ts - INTERVAL 30 MINUTES"),
        ).collect()
    }
    assert got == expected


def test_streaming_dedup_drop_duplicates(spark, tmp_path):
    from ripcurrent_spark.operators.dedup import norm_text

    src = tmp_path / "docs"
    docs1 = [{"doc_id": 1, "text": "Hello, World!"}, {"doc_id": 2, "text": "other doc"}]
    docs2 = [{"doc_id": 3, "text": "hello   world"}, {"doc_id": 4, "text": "fresh one"}]
    _write(src, [docs1, docs2])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1").json(str(src))
    )
    deduped = (
        stream.withColumn("content_hash", F.md5(norm_text("text")))
        .dropDuplicates(["content_hash"])
    )
    q = (
        deduped.writeStream.format("memory").queryName("sdedup").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    kept = sorted(r.doc_id for r in spark.table("sdedup").collect())
    # doc 3 normalizes to doc 1's content -> dropped ACROSS triggers
    assert kept == [1, 2, 4]


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """LEFT OUTER stream-stream join: a purchase with no click in its
    30-minute lookback emits ONCE with null click columns after the
    watermark closes its window — and the streamed result set equals
    the batch left join on the same data."""
    from ripcurrent_spark.streaming.joins import (
        interval_join_batch,
        interval_join_streams,
    )

    src = tmp_path / "src"
    _write(src, [EVENTS[:5], EVENTS[5:]])

    def split(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        return purchases, clicks

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
    )
    sp, sc = split(stream)
    # purchase is the LEFT side; a click must precede it by <= 30 min:
    # p_ts in [c_ts, c_ts + 30 min] <=> c_ts in [p_ts - 30 min, p_ts].
    joined = interval_join_streams(
        sp,
        sc,
        key=("p_user", "c_user"),
        ts=("p_ts", "c_ts"),
        lower="-30 minutes",
        upper="0 seconds",
        watermark="2 hours",
        how="left_outer",
    ).select("purchase_id", "click_id")
    out = tmp_path / "out"
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .option("path", str(out))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.createDataFrame(
        [(e["ts"], e["user_id"], e["event_type"], e["event_id"]) for e in EVENTS],
        "ts string, user_id long, event_type string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bp, bc = split(batch)
    want = {
        (r.purchase_id, r.click_id)
        for r in interval_join_batch(
            bp,
            bc,
            key=("p_user", "c_user"),
            ts=("p_ts", "c_ts"),
            lower="-30 minutes",
            upper="0 seconds",
            how="left_outer",
        )
        .select("purchase_id", "click_id")
        .collect()
    }
    assert (3, None) in got  # the unmatched purchase null-emits
    assert got == want


def _outer_join_scenario(spark, tmp_path, how):
    """Shared harness for the outer-join family: purchases LEFT,
    clicks RIGHT, 30-minute lookback. Adds an unmatched CLICK (user 3
    never purchases) so the right side has a null-emission too; the
    t=600 pusher pair matches itself, so every unmatched row on
    either side sits far below the final watermark and must emit."""
    from ripcurrent_spark.streaming.joins import (
        interval_join_batch,
        interval_join_streams,
    )

    events = EVENTS[:5] + [_ev(30, 3, "click", 50)] + EVENTS[5:]
    src = tmp_path / "src"
    _write(src, [events[:6], events[6:]])

    def split(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        return purchases, clicks

    args = dict(
        key=("p_user", "c_user"),
        ts=("p_ts", "c_ts"),
        lower="-30 minutes",
        upper="0 seconds",
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(str(src))
    )
    sp, sc = split(stream)
    joined = interval_join_streams(
        sp, sc, watermark="2 hours", how=how, **args
    ).select("purchase_id", "click_id")
    out = tmp_path / "out"
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .option("path", str(out))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.purchase_id, r.click_id) for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.createDataFrame(
        [(e["ts"], e["user_id"], e["event_type"], e["event_id"]) for e in events],
        "ts string, user_id long, event_type string, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bp, bc = split(batch)
    want = {
        (r.purchase_id, r.click_id)
        for r in interval_join_batch(bp, bc, how=how, **args)
        .select("purchase_id", "click_id")
        .collect()
    }
    return got, want


def test_stream_stream_right_outer_interval_join(spark, tmp_path):
    """RIGHT OUTER: a click no purchase follows within 30 minutes
    emits ONCE with null purchase columns after its window provably
    closes; streamed result equals the batch right join."""
    got, want = _outer_join_scenario(spark, tmp_path, "right_outer")
    assert (None, 50) in got  # the unmatched click null-emits
    assert got == want


def test_stream_stream_full_outer_interval_join(spark, tmp_path):
    """FULL OUTER: unmatched rows from BOTH sides null-emit exactly
    once; streamed result equals the batch full join."""
    got, want = _outer_join_scenario(spark, tmp_path, "full_outer")
    assert (None, 50) in got  # unmatched right
    assert (3, None) in got  # unmatched left
    assert got == want
