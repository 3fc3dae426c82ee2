"""CDC unit tests: envelope parse on hand-written Debezium JSON,
logical-type decode values, snapshot/SCD2 apply on a hand-computed
changelog."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ripcurrent_spark.cdc import decode as D
from ripcurrent_spark.cdc.apply import changelog_counts, latest_snapshot, scd2_history
from ripcurrent_spark.cdc.envelope import parse_envelope

# A realistic Debezium (JSON converter) event, trimmed to the fields
# the reference consumes (Main.java:165-190).
_VALUE = {
    "payload": {
        "op": "u",
        "ts_ms": 1700000000123,
        "source": {"db": "inventory", "schema": "public", "table": "customers"},
        "before": {"id": "7", "email": "old@x.com"},
        "after": {"id": "7", "email": "new@x.com"},
    }
}
_KEY = {"Schema": {"fields": [{"field": "id"}]}, "payload": {"id": "7"}}

_DDL_VALUE = {
    "payload": {
        "op": "",
        "ts_ms": 1700000001000,
        "source": {"db": "inventory", "schema": "public", "table": "customers"},
        "ddl": "ALTER TABLE customers ADD COLUMN x int",
    }
}


def test_parse_envelope_update_and_key(spark):
    df = spark.createDataFrame(
        [(json.dumps(_KEY), json.dumps(_VALUE))], "key string, value string"
    )
    row = parse_envelope(df).collect()[0]
    assert row.op == "u"
    assert row.ts_ms == 1700000000123
    assert (row.db, row.schema, row.table) == ("inventory", "public", "customers")
    assert row.key_field == "id"
    assert row.key_value == "7"
    # updates carry AFTER as the row payload (Main.java:171-178)
    assert row.row_payload["email"] == "new@x.com"
    assert row.before["email"] == "old@x.com"


def test_parse_envelope_delete_uses_before(spark):
    val = json.loads(json.dumps(_VALUE))
    val["payload"]["op"] = "d"
    val["payload"]["after"] = None
    df = spark.createDataFrame([(json.dumps(_KEY), json.dumps(val))], "key string, value string")
    row = parse_envelope(df).collect()[0]
    assert row.row_payload["email"] == "old@x.com"


def test_parse_envelope_ddl_event(spark):
    df = spark.createDataFrame(
        [(None, json.dumps(_DDL_VALUE))], "key string, value string"
    )
    row = parse_envelope(df).collect()[0]
    assert row.op == ""
    assert "ALTER TABLE" in row.ddl


def test_logical_type_decode_values(spark):
    # 1970-01-02 = epoch day 1; 10:00:30 = 36030000000 us;
    # 2023-11-14T22:13:20 = 1700000000000 ms (UTC).
    df = spark.createDataFrame([(1, 36030000000, 1700000000000)], "d int, t long, ts long")
    row = df.select(
        D.epoch_days_to_date("d").cast("string").alias("d"),
        D.micros_of_day_to_time("t").alias("t"),
        D.epoch_ms_to_datetime("ts").alias("ts"),
    ).collect()[0]
    assert row.d == "1970-01-02"  # DateTimeConversionUtil.integerToDate
    assert row.t == "10:00:30"  # numberToTime
    assert row.ts == "2023-11-14T22:13:20"  # numberToDateTime (UTC)


def test_base64_roundtrip(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    row = df.select(
        D.base64_to_binary(D.base64_of_string("s")).cast("string").alias("rt")
    ).collect()[0]
    assert row.rt == "hello"


_CHANGELOG = [
    # key 1: insert then update -> update wins
    ("c", 1, 100, 1, "a"),
    ("u", 2, 200, 1, "a2"),
    # key 2: insert then delete -> gone from snapshot
    ("c", 1, 100, 2, "b"),
    ("d", 2, 300, 2, None),
    # key 3: insert only
    ("c", 1, 150, 3, "c"),
]


def _log(spark):
    return spark.createDataFrame(
        _CHANGELOG, "op string, seq int, ts_ms long, id int, val string"
    )


def test_latest_snapshot(spark):
    snap = latest_snapshot(_log(spark), key_cols=["id"], order_cols=["ts_ms", "seq"])
    got = {r.id: (r.op, r.val) for r in snap.collect()}
    assert got == {1: ("u", "a2"), 3: ("c", "c")}


def test_scd2_history(spark):
    hist = scd2_history(_log(spark), key_cols=["id"], order_cols=["ts_ms", "seq"])
    rows = {(r.id, r.valid_from): (r.valid_to, r.is_current, r.val) for r in hist.collect()}
    assert rows[(1, 100)] == (200, False, "a")
    assert rows[(1, 200)] == (None, True, "a2")
    # deleted key: insert interval closed by the delete, no open row
    assert rows[(2, 100)] == (300, False, "b")
    assert (2, 300) not in rows
    assert rows[(3, 150)] == (None, True, "c")


def test_changelog_counts(spark):
    got = {r.op: r.n_events for r in changelog_counts(_log(spark)).collect()}
    assert got == {"c": 3, "u": 1, "d": 1}


def test_schema_driven_decode(spark):
    """The reference walks the event's embedded Connect schema and
    decodes any field whose descriptor names a Debezium logical type
    (Main.java:190-232); fields with null names pass through."""
    import json

    from ripcurrent_spark.cdc.envelope import (
        parse_envelope,
        schema_driven_decode,
        with_value_schema_fields,
    )

    value = {
        "schema": {
            "fields": [
                {
                    "fields": [
                        {"field": "id", "type": "int32", "name": None},
                        {"field": "day", "type": "int32", "name": "io.debezium.time.Date"},
                        {"field": "t", "type": "int64", "name": "io.debezium.time.MicroTime"},
                        {"field": "ts", "type": "int64", "name": "io.debezium.time.Timestamp"},
                    ]
                }
            ]
        },
        "payload": {
            "op": "c",
            "ts_ms": 1,
            "source": {"db": "d", "schema": "s", "table": "t"},
            "before": None,
            "after": {"id": "7", "day": "19723", "t": "45296000000", "ts": "1704110696000"},
        },
    }
    df = spark.createDataFrame([(json.dumps(value),)], "value string")
    out = schema_driven_decode(parse_envelope(with_value_schema_fields(df)))
    row = out.select("row_payload").collect()[0]["row_payload"]
    assert row["id"] == "7"  # null logical name -> untouched
    assert row["day"] == "2024-01-01"  # 19723 epoch-days
    assert row["t"] == "12:34:56"  # 45296s of day
    assert row["ts"] == "2024-01-01T12:04:56"  # epoch-millis, UTC


def test_malformed_events_route_to_dead_letters(spark):
    """Garbage JSON and schema-less payloads must not fail the job —
    they parse to null envelopes and split into the quarantine frame."""
    import json

    from ripcurrent_spark.cdc.envelope import parse_envelope, split_dead_letters

    good = {
        "payload": {
            "op": "c",
            "ts_ms": 1,
            "source": {"db": "d", "schema": "s", "table": "t"},
            "before": None,
            "after": {"id": "1"},
        }
    }
    rows = [
        ("k1", json.dumps(good)),
        ("k2", "{not valid json at all"),
        ("k3", json.dumps({"something": "else"})),
        ("k4", None),
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    ok, dead = split_dead_letters(parse_envelope(df))
    assert ok.count() == 1
    assert ok.collect()[0].op == "c"
    assert dead.count() == 3
