"""End-to-end test of the application shell (``run_app``): properties
config + IRI XML libraries + file-source changelog -> masked upsert
target + schema-change audit log, the reference's full deliverable
(Main.java:83-157)."""

from __future__ import annotations

import json
import textwrap

from ripcurrent_spark.app import AppHandle, load_properties, run_app

RULES_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="ASCII"?>
    <rules:RuleLibrary xmi:version="2.0" xmlns:xmi="http://www.omg.org/XMI" xmlns:rules="http://rules/1.0">
      <rules xsi:type="rules:FieldRule" name="FieldStringRule" editor="w" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
        <properties fieldRulePropertyType="EXPRESSION" value="toupper(${FIELDNAME})"/>
        <properties fieldRulePropertyType="NAME" value="UP_${FIELDNAME}"/>
      </rules>
    </rules:RuleLibrary>
""")

# EMAIL: value-pattern matcher -> toupper rule (first-match-wins).
DATACLASS_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="ASCII"?>
    <dataclass:DataClassLibrary xmi:version="2.0" xmlns:xmi="http://www.omg.org/XMI" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns:dataclass="http://dataclass/1.0">
      <dataClasses xsi:type="dataclass:DataClass" name="EMAIL" description="" nameMatcher="">
        <defaultRule href="lib.rules#FieldStringRule"/>
        <matchers details="\\b[\\w._%+-]+@[\\w.-]+\\.[A-Za-z]{2,4}\\b"/>
      </dataClasses>
    </dataclass:DataClassLibrary>
""")


def _event(table, op, ts, key, email=None, city=None, before=None, ddl=None):
    payload = {
        "op": op,
        "ts_ms": ts,
        "source": {"db": "db1", "schema": "public", "table": table},
        "before": before,
        "after": None
        if op == "d"
        else {"id": str(key), "email": email, "city": city},
    }
    if ddl is not None:
        payload["ddl"] = ddl
    return {
        "key": json.dumps(
            {"Schema": {"fields": [{"field": "id"}]}, "payload": {"id": str(key)}}
        ),
        "value": json.dumps({"payload": payload}),
    }


EVENTS = [
    _event("cust", "c", 100, 1, "a@x.com", "rome"),
    _event("cust", "c", 100, 2, "b@y.org", "oslo"),
    _event("cust", "u", 200, 1, "a2@x.com", "rome"),
    _event("cust", "d", 300, 2, before={"id": "2", "email": "b@y.org", "city": "oslo"}),
    _event("orders", "c", 100, 7, "c@z.io", "bern"),
    _event("cust", "", 400, 0, ddl="ALTER TABLE cust ADD COLUMN z int"),
    # A table matching the reference-style exclude regex must be skipped.
    _event("cust_masked", "c", 100, 9, "x@x.com", "nope"),
]


def _write_config(tmp_path) -> str:
    (tmp_path / "events").mkdir()
    with open(tmp_path / "events" / "part-000.json", "w") as f:
        for e in EVENTS:
            f.write(json.dumps(e) + "\n")
    (tmp_path / "lib.rules").write_text(RULES_XML)
    (tmp_path / "lib.dataclass").write_text(DATACLASS_XML)
    cfg = tmp_path / "config.properties"
    cfg.write_text(
        textwrap.dedent("""\
        # file-source twin of the Debezium connector block
        sourcePath=events
        targetPath=out
        dataClassLibraryPath=lib.dataclass
        rulesLibraryPath=lib.rules
        targetNamePostfix=_masked
        schemaChangeEventLog=schema_change_events.log
        table.exclude.list=.*_masked
        """)
    )
    return str(cfg)


def test_load_properties(tmp_path):
    p = tmp_path / "c.properties"
    p.write_text("# comment\na=1\nsep=\\t\n!also comment\nspaced = v \n")
    assert load_properties(p) == {"a": "1", "sep": "\t", "spaced": "v"}


def test_run_app_end_to_end(spark, tmp_path):
    handle = run_app(spark, _write_config(tmp_path), once=True)
    assert isinstance(handle, AppHandle)

    # Discovery: both DML tables planned, the _masked one excluded.
    by_table = {p.table: p for p in handle.plans}
    assert set(by_table) == {"cust", "orders"}
    cust = by_table["cust"]
    assert cust.key_field == "id"  # first PK field of the key schema
    assert cust.columns == ["id", "email", "city"]
    assert [(cc.column, cc.rule_name) for cc in cust.classifications] == [
        ("email", "FieldStringRule")
    ]

    # Masked upsert target: latest-per-key, delete dropped, EMAIL
    # column masked via the XML rule as ALTERED_email.
    snap = {
        r.id: r
        for r in spark.read.parquet(str(tmp_path / "out" / "cust_masked")).collect()
    }
    assert set(snap) == {"1"}
    assert snap["1"].ALTERED_email == "A2@X.COM"
    assert snap["1"].city == "rome"  # unclassified column passes through

    orders = spark.read.parquet(str(tmp_path / "out" / "orders_masked")).collect()
    assert len(orders) == 1 and orders[0].ALTERED_email == "C@Z.IO"

    # Schema-change audit log (Main.java:293-310 format).
    log = (tmp_path / "schema_change_events.log").read_text()
    assert "ALTER TABLE cust ADD COLUMN z int" in log
    assert "detected for table 'db1.cust'" in log

    # All streams stopped after the drain.
    assert all(not q.isActive for q in handle.queries)


def test_run_app_restart_evolves_widened_schema(spark, tmp_path):
    """ADVICE r4: plans are discovered once at startup, so a column
    added upstream mid-run only enters the stream after a restart —
    the first merge against the existing NARROWER target must then
    widen it (evolve_schema) instead of dying on the column-drift
    guard. Old rows surface NULL for the new column."""
    import os

    cfg = _write_config(tmp_path)
    run_app(spark, cfg, once=True)

    e = _event("cust", "u", 500, 1, "a3@x.com", "rome")
    val = json.loads(e["value"])
    val["payload"]["after"]["phone"] = "555-0100"
    e["value"] = json.dumps(val)
    batch2 = tmp_path / "events" / "part-001.json"
    with open(batch2, "w") as f:
        f.write(json.dumps(e) + "\n")
    # File-source triggers order by mtime: make batch 2 strictly newer.
    first = tmp_path / "events" / "part-000.json"
    os.utime(batch2, (first.stat().st_mtime + 10, first.stat().st_mtime + 10))

    handle = run_app(spark, cfg, once=True)
    by_table = {p.table: p for p in handle.plans}
    assert "phone" in by_table["cust"].columns  # re-discovery saw it

    snap = {
        r.id: r
        for r in spark.read.parquet(str(tmp_path / "out" / "cust_masked")).collect()
    }
    assert snap["1"].phone == "555-0100"
    assert snap["1"].ALTERED_email == "A3@X.COM"


def test_run_app_record_mode_flat_file_target(spark, tmp_path):
    """Verdict r4 item 3: dataTarget + dataTargetProcessType=record +
    dataTargetSeparator plumb through to flat-file targets — masked
    CREATE events append as separator-delimited records (the
    reference emits /OUTFILE + /APPEND only for op 'c' in record
    mode, Main.java:456-464), updates/deletes excluded, audit log
    still written."""
    cfg_path = _write_config(tmp_path)
    with open(cfg_path, "a") as f:
        f.write("dataTarget=flat\ndataTargetProcessType=record\ndataTargetSeparator=\\t\n")

    handle = run_app(spark, cfg_path, once=True)
    assert all(not q.isActive for q in handle.queries)

    lines = set()
    for p in (tmp_path / "flat" / "cust_masked").glob("part-*"):
        lines |= {ln for ln in p.read_text().splitlines() if ln}
    # Creates only (keys 1 and 2), EMAIL masked via the XML rule,
    # tab-separated in source column order (id, email, city).
    assert lines == {"1\tA@X.COM\trome", "2\tB@Y.ORG\toslo"}
    order_lines = set()
    for p in (tmp_path / "flat" / "orders_masked").glob("part-*"):
        order_lines |= {ln for ln in p.read_text().splitlines() if ln}
    assert order_lines == {"7\tC@Z.IO\tbern"}
    # No parquet upsert target in record mode; audit log still lands.
    assert not (tmp_path / "out" / "cust_masked").exists()
    assert "ALTER TABLE cust" in (tmp_path / "schema_change_events.log").read_text()


def test_run_app_kafka_wire_source(spark, tmp_path):
    """Verdict r4 item 9: sourceFormat=kafka-wire-files drives the
    whole app off the mocked-broker contract (binary key/value wire
    records) and produces the identical masked upsert target as the
    json-file twin."""
    import datetime

    from ripcurrent_spark.sources import KAFKA_WIRE_SCHEMA

    cfg_path = _write_config(tmp_path)
    wire_rows = [
        (
            e["key"].encode(),
            e["value"].encode(),
            "server1.public.t",
            i % 2,
            i,
            datetime.datetime(2026, 1, 1, 0, 0, i),
            0,
        )
        for i, e in enumerate(EVENTS)
    ]
    spark.createDataFrame(wire_rows, KAFKA_WIRE_SCHEMA).write.parquet(
        str(tmp_path / "events_wire")
    )
    with open(cfg_path, "a") as f:
        f.write("sourceFormat=kafka-wire-files\nsourcePath=events_wire\n")

    handle = run_app(spark, cfg_path, once=True)
    by_table = {p.table: p for p in handle.plans}
    assert set(by_table) == {"cust", "orders"}

    snap = {
        r.id: r
        for r in spark.read.parquet(str(tmp_path / "out" / "cust_masked")).collect()
    }
    assert set(snap) == {"1"}
    assert snap["1"].ALTERED_email == "A2@X.COM"
    assert snap["1"].city == "rome"


def test_run_app_requires_source_path_for_file_sources(spark, tmp_path):
    """sourcePath is required for file transports (clear error, not a
    KeyError mid-startup) but optional for sourceFormat=kafka, where
    there are no files to point at. A BLANKED `sourcePath=` line is
    'missing' too — it must hit the same friendly error, not a cryptic
    read-from-None failure downstream."""
    import pytest

    cfg_path = _write_config(tmp_path)
    base = [
        ln
        for ln in open(cfg_path).read().splitlines()
        if not ln.startswith("sourcePath=")
    ]
    for variant in (base, base + ["sourcePath="]):
        with open(cfg_path, "w") as f:
            f.write("\n".join(variant) + "\n")
        with pytest.raises(ValueError, match="sourcePath"):
            run_app(spark, cfg_path, once=True)


def test_run_app_rejects_file_trigger_key_for_kafka(spark, tmp_path):
    """maxFilesPerTrigger counts FILES; for a broker source it neither
    applies nor approximates — a config carrying it must fail loudly
    instead of running unthrottled against the whole backlog."""
    import pytest

    cfg_path = _write_config(tmp_path)
    with open(cfg_path, "a") as f:
        f.write(
            "sourceFormat=kafka\n"
            "maxFilesPerTrigger=100\n"
            "kafka.bootstrap.servers=localhost:9\n"
            "kafka.topicPattern=dbserver1\\..*\n"
        )
    with pytest.raises(ValueError, match="maxOffsetsPerTrigger"):
        run_app(spark, cfg_path, once=True)


def test_run_app_record_mode_writes_raw_unquoted_records(spark, tmp_path):
    """ADVICE r5: the reference's RECORD /OUTFILE target writes raw
    separator-delimited records — a masked value containing the
    separator or a quote char must land verbatim, not CSV-quoted."""
    (tmp_path / "events").mkdir()
    ev = _event("cust", "c", 100, 9, "x@x.com", 'a,b "q"')
    with open(tmp_path / "events" / "part-000.json", "w") as f:
        f.write(json.dumps(ev) + "\n")
    (tmp_path / "lib.rules").write_text(RULES_XML)
    (tmp_path / "lib.dataclass").write_text(DATACLASS_XML)
    cfg = tmp_path / "config.properties"
    cfg.write_text(
        textwrap.dedent("""\
        sourcePath=events
        targetPath=out
        dataClassLibraryPath=lib.dataclass
        rulesLibraryPath=lib.rules
        targetNamePostfix=_masked
        schemaChangeEventLog=schema_change_events.log
        dataTarget=flat
        dataTargetProcessType=record
        dataTargetSeparator=,
        """)
    )
    handle = run_app(spark, str(cfg), once=True)
    assert all(not q.isActive for q in handle.queries)
    lines = set()
    for p in (tmp_path / "flat" / "cust_masked").glob("part-*"):
        lines |= {ln for ln in p.read_text().splitlines() if ln}
    # Byte parity with the reference: embedded separator and quotes
    # emitted verbatim (the re-parse ambiguity is the reference's too).
    assert lines == {'9,X@X.COM,a,b "q"'}
