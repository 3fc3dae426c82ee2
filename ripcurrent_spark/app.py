"""Config-driven application shell — the reference's deliverable as a
single entry point (``python -m ripcurrent_spark --config <path>``).

Mirrors Main.java:83-157's startup sequence on Spark:

1.  load a Java-properties config (Main.java:104-110; same key names
    where the reference defines them: ``dataClassLibraryPath``,
    ``rulesLibraryPath``, ``targetNamePostfix``,
    ``schemaChangeEventLog`` — Main.java:36-43);
2.  ingest the IRI rules + data-class XML libraries
    (Main.java:146-148 -> classify/xml_io.py);
3.  discover tables/columns/keys from a batch sample of the source
    and classify each table's columns ONCE so the streaming plans are
    static (the reference classifies per event batch,
    Main.java:351-365; key = first primary-key field of the event key
    schema, Main.java:183-189);
4.  start one streaming CDC pipeline per table
    (decode -> mask -> bucket-scoped upsert to
    ``<targetPath>/<table><targetNamePostfix>``) plus the
    schema-change audit stream (Main.java:293-310);
5.  run until signaled (SIGINT/SIGTERM -> graceful stop, the
    embedded-engine shutdown hook of Main.java:150-157), or drain and
    exit with ``--once``.

Target modes (Main.java:151-155 + script emission 447-521):

- default: bucket-scoped parquet UPSERT per table (the ODBC-target
  /UPDATE //DELETE //APPEND semantics on a lakehouse layout);
- ``dataTarget=<path>`` + ``dataTargetProcessType=record`` (+
  ``dataTargetSeparator``, default tab; ``\\t`` escapes decode per
  load_properties): the reference's RECORD/flat-file deliverable —
  masked CREATE events append as separator-delimited records
  (Main.java:456-464 emits /OUTFILE + /APPEND for op "c" only in
  record mode), one flat-file directory per table under
  ``<dataTarget>/<table><postfix>`` (the reference appends all tables
  to one file because its engine loop is sequential; per-table dirs
  are the parallel-writer equivalent and keep heterogeneous schemas
  apart).

Extra keys (no reference equivalent — the file-source twin of the
Debezium connector block): ``sourcePath`` (dir of JSON-line change
events), ``targetPath``, ``checkpointPath``, ``classifyThreshold``,
``table.include.list`` (comma list), ``table.exclude.list`` (regex;
the reference default excludes its own ``.*_masked`` targets),
``maxFilesPerTrigger``, and ``sourceFormat`` selecting the transport:
``json-files`` (default), ``kafka-wire-files`` (parquet files of
Kafka-wire records — binary key/value + topic/partition/offset, the
mocked-broker contract of tests/test_kafka_source.py), or ``kafka``
(a real broker via sources.read_debezium_kafka; needs the
spark-sql-kafka jar plus ``kafka.bootstrap.servers`` /
``kafka.topicPattern``; throttles via ``maxOffsetsPerTrigger`` —
records, not files — and ``sourcePath`` becomes optional). All
transports land on the one parsed
envelope, so downstream plans are identical. Relative paths resolve
against the config file's directory (the reference resolves against
APP_HOME).
"""

from __future__ import annotations

import re
import signal
import threading
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ripcurrent_spark.cdc.envelope import parse_envelope
from ripcurrent_spark.classify.library import (
    ColumnClassification,
    DataClassLibrary,
    classify_columns,
)
from ripcurrent_spark.classify.xml_io import load_dataclass_xml, load_rules_xml
from ripcurrent_spark.rules.model import RulesLibrary
from ripcurrent_spark.streaming.pipeline import (
    masked_cdc_stream,
    read_cdc_stream,
    schema_change_audit,
    typed_payload,
    upsert_foreach_batch,
)

_DML_OPS = ("c", "u", "d")


def load_properties(path: str | Path) -> dict[str, str]:
    """Minimal Java-properties reader (the subset config.properties
    uses): ``key=value`` lines, ``#``/``!`` comments, ``\\t`` escape."""
    out: dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line[0] in "#!":
            continue
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        out[k.strip()] = v.strip().replace("\\t", "\t")
    return out


@dataclass
class TablePlan:
    """Everything the per-table stream needs, decided from the batch
    discovery sample so the streaming plan is static."""

    table: str
    columns: list[str]
    key_field: str
    classifications: list[ColumnClassification]
    target_dir: str


@dataclass
class AppHandle:
    """What run_app started — enough for a caller (or test) to inspect
    and stop it."""

    plans: list[TablePlan]
    schema_change_log: str
    queries: list = field(default_factory=list)

    def stop(self) -> None:
        for q in self.queries:
            try:
                q.stop()
            except Exception:
                pass


def _resolve(base: Path, p: str) -> str:
    pp = Path(p)
    return str(pp if pp.is_absolute() else base / pp)


def load_libraries(
    cfg: dict[str, str], base: Path
) -> tuple[RulesLibrary, DataClassLibrary]:
    """rulesLibraryPath + dataClassLibraryPath -> (RulesLibrary,
    DataClassLibrary). Missing keys degrade to empty libraries with
    the reference's warning semantics (Main.java:137-144: unset
    library paths are warnings, not errors)."""
    rules_path = cfg.get("rulesLibraryPath")
    dc_path = cfg.get("dataClassLibraryPath")
    rules_map = load_rules_xml(_resolve(base, rules_path)) if rules_path else {}
    rl = RulesLibrary()
    for n, r in rules_map.items():
        rl.add(n, r)
    if dc_path:
        dc_file = _resolve(base, dc_path)
        dclib = load_dataclass_xml(
            dc_file, rules_map, set_search_dirs=[base, Path(dc_file).parent]
        )
    else:
        dclib = DataClassLibrary()
    return rl, dclib


def discover_tables(
    spark: SparkSession,
    source_path: str,
    dclib: DataClassLibrary,
    threshold: float,
    include: list[str] | None,
    exclude_re: str | None,
    target_path: str,
    postfix: str,
    raw: DataFrame | None = None,
) -> list[TablePlan]:
    """Batch-sample the source to decide, per table: column list (in
    first-event payload order), key field, and column classifications.
    The generic envelope carries string payloads
    (decimal.handling.mode=string precedent, Main.java:143-144), so
    sampled columns type as strings; logical-type decode is the
    schema-driven path (cdc/decode.py) when the events embed one.
    ``raw`` overrides the default json-file read with another
    transport's (key, value) string frame (see run_app's
    ``sourceFormat``)."""
    if raw is None:
        raw = spark.read.schema("key string, value string").json(source_path)
    # Keep the raw value line ("_"-prefixed columns pass through the
    # envelope parse): Spark's MapType does not preserve JSON key
    # order, but the source column ORDER matters (the reference keeps
    # source positions), so the first event re-parses driver-side.
    parsed = (
        parse_envelope(raw.withColumn("_raw", F.col("value")))
        .filter(F.col("op").isin(*_DML_OPS))
        .persist()
    )
    tables = sorted(r[0] for r in parsed.select("table").distinct().collect() if r[0])
    if include:
        tables = [t for t in tables if t in include]
    if exclude_re:
        rx = re.compile(exclude_re)
        tables = [t for t in tables if not rx.fullmatch(t)]
    plans: list[TablePlan] = []
    for t in tables:
        tp = parsed.filter(F.col("table") == t)
        # Deterministic tiebreak past ts_ms: snapshot loads commonly
        # share one ts, and an arbitrary .first() would make column
        # order / key_field flap across app restarts.
        first = tp.orderBy("ts_ms", "key_value", "_raw").select(
            "_raw", "key_field"
        ).first()
        import json as _json

        payload = _json.loads(first["_raw"]).get("payload", {})
        first_rp = payload.get("after") or payload.get("before") or {}
        columns = list(first_rp.keys())
        extra = sorted(
            r[0]
            for r in tp.select(
                F.explode(F.map_keys("row_payload")).alias("k")
            )
            .distinct()
            .collect()
            if r[0] not in columns
        )
        columns += extra
        key_field = first["key_field"] or (columns[0] if columns else "")
        sample = typed_payload(tp, [(c, "string") for c in columns]).select(*columns)
        ccs = classify_columns(sample, dclib, threshold=threshold)
        # Never mask the merge key (the reference applies rules to data
        # fields; the key comes from the key schema, Main.java:183-189).
        ccs = [cc for cc in ccs if cc.column != key_field]
        plans.append(
            TablePlan(
                table=t,
                columns=columns,
                key_field=key_field,
                classifications=ccs,
                target_dir=str(Path(target_path) / f"{t}{postfix}"),
            )
        )
    parsed.unpersist()
    return plans


def _read_source(
    spark: SparkSession, cfg: dict[str, str], source_path: str, mfpt: int | None
) -> tuple[DataFrame, DataFrame]:
    """(batch raw key/value frame for discovery, parsed-envelope
    STREAM) for the configured ``sourceFormat``. Every transport lands
    on the one envelope contract, so downstream plans are identical —
    the app switches brokers by config, not code."""
    from ripcurrent_spark.sources import (
        KAFKA_WIRE_SCHEMA,
        kafka_records_to_envelope,
        read_debezium_kafka,
    )

    fmt = cfg.get("sourceFormat", "json-files")
    if fmt == "json-files":
        raw = spark.read.schema("key string, value string").json(source_path)
        return raw, read_cdc_stream(spark, source_path, max_files_per_trigger=mfpt)
    if fmt == "kafka-wire-files":
        # Parquet files of Kafka-wire records (binary key/value +
        # topic/partition/offset) — the mocked-broker contract pinned
        # by tests/test_kafka_source.py, and the replay format a real
        # pipeline's raw-topic archiver lands.
        raw = (
            spark.read.schema(KAFKA_WIRE_SCHEMA)
            .parquet(source_path)
            .select(
                F.col("key").cast("string").alias("key"),
                F.col("value").cast("string").alias("value"),
            )
        )
        reader = spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        if mfpt:
            reader = reader.option("maxFilesPerTrigger", str(mfpt))
        return raw, kafka_records_to_envelope(reader.parquet(source_path))
    if fmt == "kafka":
        # Deliberately NOT mfpt: maxFilesPerTrigger counts FILES
        # (thousands of records each); reusing it as a per-RECORD cap
        # would throttle a broker stream to a crawl. Brokers get their
        # own unit-correct key — and a config carrying the file key
        # fails LOUDLY (before any broker connection is attempted)
        # rather than running silently unthrottled.
        if cfg.get("maxFilesPerTrigger"):
            raise ValueError(
                "maxFilesPerTrigger does not apply to sourceFormat=kafka "
                "(files vs records); set maxOffsetsPerTrigger instead"
            )
        # Live broker (requires the spark-sql-kafka jar): sourcePath is
        # unused; the topic pattern selects tables.
        servers = cfg["kafka.bootstrap.servers"]
        pattern = cfg["kafka.topicPattern"]
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", servers)
            .option("subscribePattern", pattern)
            .option("startingOffsets", "earliest")
            .load()
            .select(
                F.col("key").cast("string").alias("key"),
                F.col("value").cast("string").alias("value"),
            )
        )
        mopt = (
            int(cfg["maxOffsetsPerTrigger"])
            if cfg.get("maxOffsetsPerTrigger")
            else None
        )
        stream = read_debezium_kafka(
            spark, servers, pattern, max_offsets_per_trigger=mopt
        )
        return raw, stream
    raise ValueError(f"unknown sourceFormat {fmt!r}")


def run_app(
    spark: SparkSession,
    config_path: str | Path,
    once: bool = False,
    install_signal_handlers: bool | None = None,
) -> AppHandle:
    """Load config, ingest libraries, start the per-table masked CDC
    pipelines + schema-change audit stream; with ``once`` drain the
    available input and stop (for tests/batch catch-up), otherwise
    block until SIGINT/SIGTERM."""
    cfg = load_properties(config_path)
    base = Path(config_path).resolve().parent
    # sourcePath is the file-transport input dir; a live-broker config
    # (sourceFormat=kafka) has no files to point at, so the key is
    # optional there and required everywhere else. Falsy, not just
    # missing: a blanked-out `sourcePath=` line must hit this error,
    # not a cryptic read-from-None failure downstream.
    if not cfg.get("sourcePath") and cfg.get("sourceFormat", "json-files") != "kafka":
        raise ValueError("config key 'sourcePath' is required for file sources")
    source_path = _resolve(base, cfg["sourcePath"]) if cfg.get("sourcePath") else None
    target_path = _resolve(base, cfg["targetPath"])
    ckpt = _resolve(base, cfg.get("checkpointPath", str(Path(target_path) / "_checkpoints")))
    postfix = cfg.get("targetNamePostfix", "")
    threshold = float(cfg.get("classifyThreshold", "0.8"))
    # Main.java:112: unset -> "schema_change_events.log"
    log_path = _resolve(base, cfg.get("schemaChangeEventLog", "schema_change_events.log"))
    include = [
        t.strip() for t in cfg.get("table.include.list", "").split(",") if t.strip()
    ] or None
    exclude_re = cfg.get("table.exclude.list") or None
    mfpt = int(cfg["maxFilesPerTrigger"]) if cfg.get("maxFilesPerTrigger") else None
    # Main.java:151-155: unset process type defaults to ODBC (here:
    # the parquet upsert twin); "record" selects the flat-file target.
    data_target = cfg.get("dataTarget")
    process_type = cfg.get("dataTargetProcessType", "ODBC")
    separator = cfg.get("dataTargetSeparator") or "\t"
    record_mode = data_target is not None and process_type.lower() == "record"
    if record_mode:
        data_target = _resolve(base, data_target)

    rl, dclib = load_libraries(cfg, base)
    raw_batch, stream = _read_source(spark, cfg, source_path, mfpt)
    plans = discover_tables(
        spark,
        source_path,
        dclib,
        threshold,
        include,
        exclude_re,
        target_path,
        postfix,
        raw=raw_batch,
    )

    handle = AppHandle(plans=plans, schema_change_log=log_path)
    meta_cols = ("op", "ts_ms", "table", "key_field", "key_value")
    for plan in plans:
        masked = masked_cdc_stream(
            stream.filter(F.col("table") == plan.table),
            [(c, "string") for c in plan.columns],
            plan.classifications,
            rl,
        )
        if record_mode:
            # The reference's RECORD target appends masked CREATE
            # events only (/OUTFILE + /APPEND is emitted solely for
            # op "c", Main.java:456-464); data columns keep source
            # positions with ALTERED_ names where a rule applied.
            out_cols = [c for c in masked.columns if c not in meta_cols]
            # Byte-layout pin (ADVICE r6): every payload column is
            # decoded as STRING by construction (the plan above passes
            # (c, "string") for all columns), so the cast below never
            # touches Spark's internal timestamp/date/binary rendering
            # — which differs byte-wise from any explicit format and
            # would silently change the flat-file layout. Fail fast if
            # that contract ever breaks instead of committing an
            # unpinned rendering to the target.
            non_string = [
                f.name
                for f in masked.schema.fields
                if f.name in out_cols and not isinstance(f.dataType, T.StringType)
            ]
            if non_string:
                raise ValueError(
                    "record-mode sink requires string payload columns "
                    f"(got non-string {non_string}); format them explicitly "
                    "(date_format/hex) upstream to pin the byte layout"
                )
            # Raw-record emission (ADVICE r5): the reference's RECORD
            # /OUTFILE target writes separator-delimited records
            # verbatim, so the line is assembled explicitly
            # (concat_ws over string-cast fields, NULL -> empty field)
            # and written through the text sink — the CSV sink
            # quotes/escapes a masked value containing the separator
            # or quote char (even with quote="" it wraps in \\x00),
            # diverging byte-for-byte. A payload value containing the
            # separator is then ambiguous on re-parse; the reference
            # target has the identical ambiguity, which is the point
            # of byte parity.
            line = F.concat_ws(
                separator,
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit(""))
                    for c in out_cols
                ],
            )
            q = (
                masked.filter(F.col("op") == "c")
                .select(line.alias("value"))
                .writeStream.outputMode("append")
                # Mode-scoped checkpoint (matches the queryName): the
                # upsert mode's foreachBatch checkpoint already holds
                # offsets through batch N, so toggling an existing
                # deployment to record mode must NOT resume from it —
                # that would silently skip all history in the new
                # flat-file target (and a file sink can't adopt a
                # foreachBatch checkpoint anyway). This record-<table>
                # layout is record mode's layout since its
                # introduction — renaming it later would restart
                # running record deployments from offset zero.
                .option("checkpointLocation", str(Path(ckpt) / f"record-{plan.table}"))
                .queryName(f"record-{plan.table}")
                .format("text")
                .option("path", str(Path(data_target) / f"{plan.table}{postfix}"))
                .start()
            )
        else:
            q = (
                masked.filter(F.col("op").isin(*_DML_OPS))
                .writeStream.outputMode("append")
                .option("checkpointLocation", str(Path(ckpt) / plan.table))
                .queryName(f"upsert-{plan.table}")
                .foreachBatch(
                    # evolve_schema: table plans are discovered once at
                    # startup, so a column ADDED mid-run only enters the
                    # stream's typed payload after a restart — at which
                    # point the first merge against the narrower existing
                    # target must widen it instead of dying on
                    # upsert_parquet's column-drift guard (the reference
                    # re-creates its script on column-set change,
                    # Main.java:238-257).
                    upsert_foreach_batch(
                        plan.target_dir, key_cols=[plan.key_field], evolve_schema=True
                    )
                )
                .start()
            )
        handle.queries.append(q)
    ddl_q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(Path(ckpt) / "_schema_changes"))
        .queryName("schema-change-audit")
        .foreachBatch(schema_change_audit(stream, log_path))
        .start()
    )
    handle.queries.append(ddl_q)

    if once:
        for q in handle.queries:
            q.processAllAvailable()
        handle.stop()
        return handle

    stop_evt = threading.Event()
    if install_signal_handlers is None:
        install_signal_handlers = threading.current_thread() is threading.main_thread()
    if install_signal_handlers:
        for sig in (signal.SIGINT, signal.SIGTERM):
            signal.signal(sig, lambda *_: stop_evt.set())
    while not stop_evt.wait(timeout=1.0):
        if all(not q.isActive for q in handle.queries):
            break
    handle.stop()
    return handle
