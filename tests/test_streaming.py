"""Streaming CDC pipeline end-to-end: file-source JSON events ->
parse -> decode -> mask -> foreachBatch upsert; schema-change audit
log; routing keys. (processAllAvailable on a tiny fixture.)"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.cdc.decode import epoch_days_to_date
from ripcurrent_spark.classify.library import ColumnClassification
from ripcurrent_spark.rules.model import Rule, RulesLibrary
from ripcurrent_spark.streaming.pipeline import (
    masked_cdc_stream,
    read_cdc_stream,
    schema_change_audit,
    upsert_foreach_batch,
    with_routing_key,
)


def _event(op, ts, key, name=None, bal=None, day=None, before=None, ddl=None):
    payload = {
        "op": op,
        "ts_ms": ts,
        "source": {"db": "db1", "schema": "public", "table": "cust"},
        "before": before,
        "after": None
        if op == "d"
        else {"id": str(key), "name": name, "bal": bal, "day": str(day)},
    }
    if ddl is not None:
        payload["ddl"] = ddl
    return {
        "key": json.dumps({"Schema": {"fields": [{"field": "id"}]}, "payload": {"id": str(key)}}),
        "value": json.dumps({"payload": payload}),
    }


EVENTS = [
    _event("c", 100, 1, "alice", "10.00", 1),
    _event("c", 100, 2, "bob", "20.00", 2),
    _event("u", 200, 1, "alice2", "11.00", 1),
    _event("d", 300, 2, before={"id": "2", "name": "bob", "bal": "20.00", "day": "2"}),
    _event("", 400, 0, ddl="ALTER TABLE cust ADD COLUMN z int"),
]

COLUMNS = [("id", "int"), ("name", "string"), ("bal", "decimal(12,2)"), ("day", "string")]


def _write_events(path, events):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part-000.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "events"
    _write_events(d, EVENTS)
    return d


def test_streaming_upsert_pipeline(spark, tmp_path, stream_dir):
    parsed = read_cdc_stream(spark, str(stream_dir))
    rules = RulesLibrary().add("up", Rule("Expression", "toupper(${FIELDNAME})"))
    cc = [ColumnClassification("name", "PERSON_NAME", "up", 1.0, True)]
    masked = masked_cdc_stream(
        parsed,
        COLUMNS,
        cc,
        rules,
        decoders={"day": lambda c: epoch_days_to_date(c).cast("string")},
    )
    target = tmp_path / "snapshot"
    q = (
        masked.filter(F.col("op").isin("c", "u", "d"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(upsert_foreach_batch(str(target), key_cols=["id"]))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    snap = {r.id: r for r in spark.read.parquet(str(target)).collect()}
    assert set(snap) == {1}  # key 2 deleted
    assert snap[1].ALTERED_name == "ALICE2"  # masked + latest update wins
    assert str(snap[1].bal) == "11.00"
    assert snap[1].day == "1970-01-02"  # epoch-day decode applied


def test_streaming_incremental_batches(spark, tmp_path):
    """Two files arriving in separate micro-batches must merge into the
    same final snapshot (incremental upsert, not full recompute)."""
    d = tmp_path / "ev"
    _write_events(d, EVENTS[:2])
    parsed = read_cdc_stream(spark, str(d), max_files_per_trigger=1)
    typed = masked_cdc_stream(parsed, COLUMNS, [], RulesLibrary())
    target = tmp_path / "snap2"
    q = (
        typed.filter(F.col("op").isin("c", "u", "d"))
        .writeStream.option("checkpointLocation", str(tmp_path / "ckpt2"))
        .foreachBatch(upsert_foreach_batch(str(target), key_cols=["id"]))
        .start()
    )
    q.processAllAvailable()
    with open(d / "part-001.json", "w") as f:
        for e in [EVENTS[2], EVENTS[3]]:
            f.write(json.dumps(e) + "\n")
    q.processAllAvailable()
    q.stop()
    snap = {r.id: r.name for r in spark.read.parquet(str(target)).collect()}
    assert snap == {1: "alice2"}


def test_schema_change_audit_log(spark, tmp_path, stream_dir):
    parsed = read_cdc_stream(spark, str(stream_dir))
    log = tmp_path / "schema_change_events.log"
    q = (
        parsed.writeStream.option("checkpointLocation", str(tmp_path / "ckpt3"))
        .foreachBatch(schema_change_audit(parsed, str(log)))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    lines = log.read_text().splitlines()
    assert len(lines) == 1
    # Main.java:299 format
    assert "Database structure change event 'ALTER TABLE cust ADD COLUMN z int' detected for table 'db1.cust'." in lines[0]


def test_routing_key(spark):
    df = spark.createDataFrame(
        [(e["key"], e["value"]) for e in EVENTS[:4]], "key string, value string"
    )
    from ripcurrent_spark.cdc.envelope import parse_envelope

    keys = [r.routing_key for r in with_routing_key(parse_envelope(df)).collect()]
    assert keys[0] == "public.cust|c|id,name,bal,day"
    assert keys[2] == "public.cust|u|id,name,bal,day"
    # delete routes by the BEFORE column set (its own plan)
    assert keys[3].startswith("public.cust|d|")


def test_scd2_foreach_batch_incremental_equals_batch(spark, tmp_path):
    """Two triggers of change events maintained incrementally must
    yield the SAME history as the batch SCD2 over all events."""
    import json as _json
    import os as _os
    import time as _time

    from ripcurrent_spark.cdc.apply import scd2_history
    from ripcurrent_spark.streaming.pipeline import scd2_foreach_batch

    rows = [
        # (op, seq, ts_ms, id, val) — key 1 updated across triggers,
        # key 2 deleted in trigger 2.
        ("c", 1, 100, 1, "a"),
        ("c", 1, 100, 2, "b"),
        ("u", 2, 200, 1, "a2"),
        ("d", 2, 300, 2, None),
        ("c", 1, 150, 3, "c"),
    ]
    batches = [rows[:2], rows[2:]]
    src = tmp_path / "ev"
    src.mkdir()
    now = _time.time()
    for i, b in enumerate(batches):
        p = src / f"{i:03d}.json"
        with open(p, "w") as f:
            for op, seq, ts, k, v in b:
                f.write(_json.dumps({"op": op, "seq": seq, "ts_ms": ts, "id": k, "val": v}) + "\n")
        _os.utime(p, (now - 100 + 10 * i, now - 100 + 10 * i))

    schema = "op string, seq int, ts_ms long, id int, val string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(str(src))
    sink = scd2_foreach_batch(
        str(tmp_path / "log"), str(tmp_path / "hist"), key_cols=["id"], order_cols=["ts_ms", "seq"]
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "hist"))
    expected = scd2_history(
        spark.createDataFrame(rows, schema), key_cols=["id"], order_cols=["ts_ms", "seq"]
    )
    k = lambda r: (r.id, r.valid_from, r.valid_to, r.is_current, r.val)
    assert sorted(map(k, got.collect())) == sorted(map(k, expected.collect()))


def test_upsert_sink_idempotent_under_replay(spark, tmp_path):
    """foreachBatch re-delivers a batch after failures; the upsert
    merge must be idempotent — applying the same batch twice yields
    the identical snapshot (latest-per-key is a set operation, and
    snapshot rows lose ties to fresh events of equal order keys)."""
    from ripcurrent_spark.sinks import upsert_parquet

    target = str(tmp_path / "snap")
    batch = spark.createDataFrame(
        [("c", 100, 1, "a"), ("c", 100, 2, "b"), ("u", 200, 1, "a2")],
        "op string, ts_ms long, id int, val string",
    )
    upsert_parquet(batch, target, key_cols=["id"], order_cols=["ts_ms"])
    first = sorted((r.id, r.val) for r in spark.read.parquet(target).collect())
    upsert_parquet(batch, target, key_cols=["id"], order_cols=["ts_ms"])  # replay
    second = sorted((r.id, r.val) for r in spark.read.parquet(target).collect())
    assert first == second == [(1, "a2"), (2, "b")]

    # a delete replayed twice stays deleted
    dels = spark.createDataFrame([("d", 300, 2, None)], "op string, ts_ms long, id int, val string")
    upsert_parquet(dels, target, key_cols=["id"], order_cols=["ts_ms"])
    upsert_parquet(dels, target, key_cols=["id"], order_cols=["ts_ms"])
    final = sorted((r.id, r.val) for r in spark.read.parquet(target).collect())
    assert final == [(1, "a2")]


def test_stream_static_enrichment_sees_dim_updates(spark, tmp_path):
    """Dimension re-read inside foreachBatch: a dim rewritten between
    triggers enriches the next trigger with the NEW values — the
    plain-parquet-correct pattern (a plan-level stream-static join
    pins the file listing at plan time and breaks on overwrite)."""
    import os
    import time as _time

    from ripcurrent_spark.streaming.pipeline import enrich_foreach_batch

    dim_dir = str(tmp_path / "dim")
    spark.createDataFrame([(1, "gold"), (2, "silver")], "id int, tier string").coalesce(
        1
    ).write.mode("overwrite").parquet(dim_dir)

    src = tmp_path / "events"
    src.mkdir()
    now = _time.time()
    p1 = src / "b1.json"
    p1.write_text('{"id": 1}\n{"id": 2}\n')
    os.utime(p1, (now - 100, now - 100))

    stream = (
        spark.readStream.format("json")
        .schema("id int")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )

    seen: dict[int, list] = {}

    def collect(enriched, batch_id):
        rows = sorted((r.id, r.tier) for r in enriched.collect())
        if rows:
            seen[len(seen)] = rows

    q = stream.writeStream.foreachBatch(
        enrich_foreach_batch(dim_dir, on="id", apply_fn=collect)
    ).start()
    try:
        q.processAllAvailable()
        assert seen[0] == [(1, "gold"), (2, "silver")]

        # dimension updated by "another pipeline" between triggers
        spark.createDataFrame(
            [(1, "platinum"), (2, "bronze")], "id int, tier string"
        ).coalesce(1).write.mode("overwrite").parquet(dim_dir)
        p2 = src / "b2.json"
        p2.write_text('{"id": 1}\n{"id": 2}\n')
        os.utime(p2, (now - 50, now - 50))
        q.processAllAvailable()
        assert seen[1] == [(1, "platinum"), (2, "bronze")]
    finally:
        q.stop()
