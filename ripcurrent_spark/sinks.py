"""Sink connectors: partitioned files + merge ("upsert") targets.

The reference's targets are ODBC tables / flat files written by
generated jobs with /APPEND, /UPDATE=(key), /DELETE=(key)
(Main.java:456-498). Batch-side here: partitioned parquet/csv writers
and an upsert-merge that applies c/u/d semantics onto an existing
parquet target (the streaming twin lives in
streaming.upsert_foreach_batch).
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.cdc.apply import latest_snapshot


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).csv(path, header=header)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """ORC writer — the reference's file targets are format-agnostic
    (SortCL writes whatever the target spec names); here every
    partitioned-write guarantee of write_parquet holds identically."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def key_bucket(key_cols: Sequence[str], n_buckets: int) -> F.Column:
    """Deterministic key-hash bucket id in [0, n_buckets): the
    partition key for merge targets. xxhash64 is JVM-side and
    null-safe; the same expression computed at write and at merge
    time guarantees a key always lands in the same bucket dir."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")


def has_bucketed_data(path: str | Path) -> bool:
    """True when a bucket-partitioned target already holds data. (The
    dynamic-partition-overwrite committer does not write a root
    _SUCCESS marker, so presence is detected by partition dirs.)"""
    p = Path(path)
    return p.exists() and any(p.glob("_bucket=*"))


def assert_bucket_layout(path: str | Path) -> None:
    """Refuse to merge into a directory holding a NON-bucketed parquet
    layout (root part files): ``has_bucketed_data`` would read it as
    empty, the merge would silently drop every existing key, and the
    write would mix ``_bucket=`` dirs with root files. Such a target
    must be rewritten with bucket partitioning first."""
    p = Path(path)
    if not p.exists():
        return
    # Anything other than _bucket=* dirs and writer metadata
    # (_SUCCESS, .crc, ...) means some other layout lives here — root
    # part files OR a differently-partitioned tree (date=.../part-*),
    # both of which has_bucketed_data would misread as "empty".
    stray = [
        e.name
        for e in p.iterdir()
        if not e.name.startswith(("_", "."))
    ]
    if stray and not any(p.glob("_bucket=*")):
        raise ValueError(
            f"{p} holds a non-bucketed layout (found {stray[:3]}...); rewrite "
            "it as _bucket=<n> partitions before merging into it"
        )


SCHEMA_SIDECAR = "_schema.json"


def write_schema_sidecar(target: str | Path, schema) -> None:
    """Record the merge target's current (possibly evolved) schema in a
    root-level sidecar. Underscore-prefixed => invisible to Spark's
    file listing. Atomic rename so readers never see a torn file."""
    p = Path(target)
    p.mkdir(parents=True, exist_ok=True)
    tmp = p / (SCHEMA_SIDECAR + ".tmp")
    tmp.write_text(schema.json())
    tmp.replace(p / SCHEMA_SIDECAR)


def target_schema(target: str | Path):
    """The evolved schema recorded by the last merge into `target`, or
    None when no sidecar exists (pre-evolution layouts)."""
    import json

    from pyspark.sql.types import StructType

    p = Path(target) / SCHEMA_SIDECAR
    if not p.exists():
        return None
    return StructType.fromJson(json.loads(p.read_text()))


def read_merge_target(spark, target: str | Path) -> DataFrame:
    """Read a bucketed merge target under its EVOLVED schema: after a
    schema-evolving merge, untouched bucket files still lack the new
    columns (they are never rewritten), so a plain read would pick an
    arbitrary footer and could silently drop evolved columns. The
    sidecar schema makes old files read the missing columns as NULL;
    without a sidecar, fall back to footer merging."""
    ts = target_schema(target)
    reader = spark.read.schema(ts) if ts is not None else spark.read.option("mergeSchema", "true")
    return reader.parquet(str(target))


def overwrite_buckets(
    df: DataFrame,
    target: str | Path,
    partition_cols: Sequence[str] = ("_bucket",),
    touched: Sequence[int] | None = None,
) -> None:
    """The one stage-and-swap write path every merge/compaction sink
    shares: stage `df` to ``<target>.tmp`` (static overwrite — stale
    stage partitions from an earlier run must truncate), dynamic-
    partition-overwrite the staged partitions into `target`, drop
    touched-but-now-empty bucket dirs, and remove the stage dir."""
    import shutil

    spark = df.sparkSession
    target = Path(target)
    tmp = str(target) + ".tmp"
    df.write.mode("overwrite").option("partitionOverwriteMode", "static").partitionBy(
        *partition_cols
    ).parquet(tmp)
    if has_bucketed_data(tmp):  # all-deletes merges stage zero files
        (
            spark.read.parquet(tmp)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(str(target))
        )
    if touched is not None:
        drop_empty_touched_buckets(target, tmp, touched)
    shutil.rmtree(tmp, ignore_errors=True)


def upsert_parquet(
    changes: DataFrame,
    target_dir: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms",),
    op_col: str = "op",
    n_buckets: int = 16,
    evolve_schema: bool = False,
) -> None:
    """Merge a c/u/d changelog into a parquet target: latest event per
    key wins over the current snapshot, deletes drop keys.

    The target is laid out as ``_bucket=<key-hash>`` partitions so the
    merge touches only buckets containing batch keys: the current
    snapshot read is partition-pruned to touched buckets, and the
    write uses dynamic partition overwrite so untouched bucket dirs
    are never rewritten. Per-merge I/O is therefore proportional to
    touched buckets, not table size — the reference's per-row
    /UPDATE=(key) / /DELETE=(key) apply (Main.java:456-498) expressed
    as partition-scoped file replacement. A lakehouse deployment swaps
    this for Delta/Iceberg MERGE with the same ordering contract.

    With ``evolve_schema=True`` a changelog that gained columns merges
    anyway (the reference logs upstream DDL, Main.java:293-310; this is
    the apply side): new columns append to the target schema, existing
    rows read them as NULL, and untouched buckets are STILL not
    rewritten — the evolved schema lives in a root sidecar consumed by
    ``read_merge_target`` (Delta's mergeSchema on the bucketed layout).
    Columns missing from the changelog backfill NULL on new rows.
    Without the flag, any column-set drift raises."""
    spark = changes.sparkSession
    target = Path(target_dir)
    assert_bucket_layout(target)
    # Persist: the touched-bucket discovery collect() and the merge
    # itself both consume the staged plan — without the barrier a
    # non-trivial source pipeline would execute twice.
    staged = (
        changes.withColumn("_bucket", key_bucket(key_cols, n_buckets))
        .withColumn("_is_snapshot", F.lit(0))
        .persist()
    )
    try:
        touched = sorted(r[0] for r in staged.select("_bucket").distinct().collect())
        if not touched:
            return
        base = staged
        out_cols = [c for c in changes.columns]
        if has_bucketed_data(target):
            current = (
                read_merge_target(spark, target)
                .filter(F.col("_bucket").isin(touched))  # partition-pruned scan
                .withColumn("_is_snapshot", F.lit(1))
            )
            if set(current.columns) != set(staged.columns):
                if not evolve_schema:
                    drift = set(current.columns) ^ set(staged.columns)
                    raise ValueError(
                        f"changelog/target column drift {sorted(drift)}; pass "
                        "evolve_schema=True to evolve the target"
                    )
                base = staged.unionByName(current, allowMissingColumns=True)
                tgt_data = [c for c in current.columns if c not in ("_bucket", "_is_snapshot")]
                out_cols = tgt_data + [c for c in out_cols if c not in tgt_data]
            else:
                base = staged.unionByName(current)
        snap = (
            latest_snapshot(
                base, key_cols=key_cols, order_cols=[*order_cols, "_is_snapshot"], op_col=op_col
            )
            .drop("_is_snapshot")
            .select(*out_cols, "_bucket")  # stable evolved column order
        )
        overwrite_buckets(snap, target, ("_bucket",), touched)
        write_schema_sidecar(target, snap.schema)
    finally:
        staged.unpersist()


def drop_empty_touched_buckets(target: Path, tmp: str, touched: Sequence[int]) -> None:
    """Dynamic partition overwrite only replaces partitions PRESENT in
    the written data — a touched bucket whose every key was deleted
    produces zero output rows, so its stale dir would silently
    survive. Remove those dirs explicitly (a lakehouse MERGE's DELETE
    branch covers this case natively)."""
    import shutil

    staged_buckets = {p.name for p in Path(tmp).glob("_bucket=*")}
    for b in touched:
        if f"_bucket={b}" not in staged_buckets:
            shutil.rmtree(Path(target) / f"_bucket={b}", ignore_errors=True)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """JDBC sink (no driver jar in image — see sources.read_jdbc)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles data ONCE at write time: two tables
    bucketed the same way join with ZERO Exchange (and with sort_cols,
    zero Sort) — the co-located-join lever for repeated fact-fact
    joins at 100 TB. Requires saveAsTable (bucket metadata lives in
    the catalog, not in plain parquet paths)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_parquet_sized(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Write with controlled output-file count (small-files defense):
    repartition to ceil(rows / target) before writing, so downstream
    scans see a few well-sized files instead of one per upstream task.
    The count() pre-pass is one cheap extra job; production pipelines
    that know their row counts (or use AQE advisory partition sizes)
    can skip it."""
    n = df.count()
    parts = max(1, -(-n // target_rows_per_file))
    df.repartition(parts).write.mode(mode).parquet(path)


def compact_snapshot_buckets(
    spark,
    target_dir: str,
    min_files: int = 2,
) -> list[int]:
    """Maintenance compaction for a ``_bucket``-partitioned merge
    target: rewrite every bucket holding >= `min_files` parquet files
    into a single file; leave the rest byte-untouched.

    Merge writes fragment buckets over time (each trigger's rewrite
    emits one file per task that held the bucket's rows), and at
    100 TB the resulting small files dominate scan open/seek cost.
    Repartitioning the read by ``_bucket`` before the rewrite puts
    each bucket's rows in exactly one task => exactly one output file
    per bucket dir. Runs offline (between triggers), like a lakehouse
    OPTIMIZE. Returns the compacted bucket ids."""
    target = Path(target_dir)
    fat = sorted(
        int(d.name.split("=", 1)[1])
        for d in target.glob("_bucket=*")
        if len(list(d.glob("*.parquet"))) >= min_files
    )
    if not fat:
        return []
    compacted = (
        spark.read.parquet(str(target))
        .filter(F.col("_bucket").isin(fat))
        .repartition(len(fat), "_bucket")
    )
    overwrite_buckets(compacted, target, ("_bucket",))
    return fat


COMPACTED_BATCH_ID = -1


def _log_compaction_stage(root: Path) -> Path:
    return root.parent / (root.name + ".compact_stage")


def _finish_log_compaction(spark, root: Path, stage: Path) -> list[int]:
    """Second half of log compaction, re-runnable from the durable
    stage: dynamic-overwrite the staged base partitions into the log,
    then delete the folded batch dirs named in the stage manifest, then
    drop the stage. Safe to repeat from any crash point — the staged
    data (not the log) is the source of truth for the new base, so
    re-overwriting is idempotent, and fold-dir deletion only removes
    content the manifest proves is already in the staged base."""
    import json
    import shutil

    manifest = json.loads((stage / "_MANIFEST.json").read_text())
    fold = manifest["folded"]
    part_cols = manifest.get("part_cols", ["_bucket", "_batch_id"])
    pattern = "/".join(f"{c}=*" for c in part_cols)
    (
        spark.read.parquet(str(stage))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*part_cols)
        .parquet(str(root))
    )
    base_dirs = []
    for d in root.glob(pattern):
        bid = int(d.name.split("=", 1)[1])
        if bid in fold:
            shutil.rmtree(d, ignore_errors=True)
        elif bid == COMPACTED_BATCH_ID:
            base_dirs.append(str(d.relative_to(root)))
    # Fold the batch-ts manifest BEFORE dropping the stage: the sealed
    # stage manifest is what re-triggers this function after a crash,
    # so the ts-manifest fold replays with it (idempotent — folded
    # keys are popped on first run, a re-run merges the base with
    # itself). Folding outside this protocol would leave time-travel
    # metadata pointing at deleted batch dirs after a crash here. The
    # base entry's dir list comes from the same post-overwrite glob
    # that drives fold-dir deletion, so it reflects exactly the base
    # partitions that survive this compaction.
    fold_batch_ts_manifest(root, fold, base_dirs=base_dirs)
    shutil.rmtree(stage, ignore_errors=True)
    return fold


def compact_log_batches(
    spark,
    log_dir: str,
    keep_latest: int = 1,
    collapse_key: Sequence[str] | None = None,
    merge_key: Sequence[str] | None = None,
    sum_cols: Sequence[str] | None = None,
) -> list[int]:
    """Fold old ``(_bucket, _batch_id)`` changelog partitions into a
    single compacted base partition (``_batch_id = -1``) per bucket.

    The SCD2 changelog accrues one leaf dir per (bucket, trigger);
    reads stay partition-pruned but file counts grow without bound.
    Folding closed batches into the base bounds them. The newest
    `keep_latest` batch ids are left in place so foreachBatch replay
    (which only re-runs batches at/after the last checkpoint) still
    overwrites its own partition instead of colliding with the base.
    Row content is preserved exactly — unless ``collapse_key`` is set,
    in which case the folded set (old base + folded batches) keeps,
    per key, only the rows of the key's NEWEST folded batch (the base
    partition counts as older than any folded batch, which it is by
    construction). That is the newest-wins contract a last-writer
    INDEX needs: without it, two admitted versions of a re-ingested
    key both land in the base with ``_batch_id = -1``, and a
    downstream max-of-struct(_batch_id, ...) fold ties on the batch id
    and picks the lexicographically larger payload — possibly the
    OLDER version (ADVICE r10 #2). Leave it None for true logs
    (decisions, SCD2 changelog) where every row is history.

    ``merge_key`` + ``sum_cols`` (r11) is the third mode, for
    MERGEABLE-COUNT partials state (the DSIR / word-frequency /
    charlm / BM25-stats streaming twins): the folded set collapses to
    ONE row per key with each ``sum_cols`` column SUMMED — the
    snapshot read over (new base + live batches) is unchanged because
    summing is exactly what the snapshot does, but the base's row
    count becomes bounded by the key space (vocabulary/bucket count)
    instead of growing by one partial-set per trigger forever.
    Mutually exclusive with ``collapse_key``.

    Like the snapshot compactor this runs offline between triggers (a
    lakehouse would checkpoint its transaction log the same way).
    Returns the folded batch ids.

    Works on both layouts the streaming sinks produce: nested
    ``_bucket=*/_batch_id=*`` (SCD2 changelog, dedup band-key index)
    and flat ``_batch_id=*`` (dedup decisions) — detected from the
    directory structure.

    Crash-safe: the new base (old base + folded batches) is first
    written to a durable sibling stage dir and sealed with a manifest;
    only then is it swapped into the log and the fold dirs deleted. A
    crash at any point leaves either (a) an unsealed stage — discarded
    on the next run, log untouched — or (b) a sealed stage — the next
    run resumes the swap from the stage, which is idempotent, instead
    of re-folding (which would duplicate rows already swapped in)."""
    import json
    import shutil

    root = Path(log_dir)
    stage = _log_compaction_stage(root)
    recovered: list[int] = []
    if (stage / "_MANIFEST.json").exists():
        recovered = _finish_log_compaction(spark, root, stage)  # crashed prior run
    elif stage.exists():
        shutil.rmtree(stage)  # unsealed stage: prior run died mid-write; log untouched

    nested = any(root.glob("_bucket=*"))
    part_cols = ["_bucket", "_batch_id"] if nested else ["_batch_id"]
    pattern = "/".join(f"{c}=*" for c in part_cols)
    batch_ids = sorted(
        {
            int(d.name.split("=", 1)[1])
            for d in root.glob(pattern)
            if int(d.name.split("=", 1)[1]) != COMPACTED_BATCH_ID
        }
    )
    fold = batch_ids[:-keep_latest] if keep_latest > 0 else batch_ids
    if not fold:
        return sorted(recovered)
    folded = spark.read.parquet(str(root)).filter(
        F.col("_batch_id").isin([*fold, COMPACTED_BATCH_ID])
    )
    if collapse_key and (merge_key is not None or sum_cols):
        raise ValueError("collapse_key and merge_key/sum_cols are exclusive")
    if collapse_key:
        # Newest-wins collapse BEFORE the ids are overwritten: per key
        # keep only the rows of its max batch id in the folded set
        # (all of a key's rows within one batch are kept — e.g. every
        # band row of the winning version).
        newest = folded.groupBy(*collapse_key).agg(
            F.max("_batch_id").alias("_newest")
        )
        folded = (
            folded.join(newest, list(collapse_key))
            .filter(F.col("_batch_id") == F.col("_newest"))
            .drop("_newest")
        )
    if merge_key is not None:
        # Sum-merge collapse for mergeable-count partials: one row per
        # key (an EMPTY key list = one global totals row), counts
        # summed — the same fold the snapshot performs. Partition
        # columns of a nested layout (_bucket) must be in the key.
        folded = folded.groupBy(*merge_key).agg(
            *[F.sum(c).alias(c) for c in (sum_cols or [])]
        )
    folded = folded.withColumn("_batch_id", F.lit(COMPACTED_BATCH_ID))
    if nested:
        folded = folded.repartition("_bucket")
    (
        folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy(*part_cols)
        .parquet(str(stage))
    )
    tmp_manifest = stage / "_MANIFEST.json.tmp"
    tmp_manifest.write_text(json.dumps({"folded": fold, "part_cols": part_cols}))
    tmp_manifest.replace(stage / "_MANIFEST.json")  # atomic seal
    _finish_log_compaction(spark, root, stage)
    return sorted({*recovered, *fold})


def merge_into(
    source: DataFrame,
    target_dir: str,
    on: Sequence[str],
    update: dict[str, str] | str | None = "all",
    delete_when: str | None = None,
    insert: bool = True,
    n_buckets: int = 16,
    evolve_schema: bool = False,
) -> None:
    """Lakehouse-MERGE facade over the bucket-partitioned parquet
    layout: one call expresses the reference's generated /UPDATE=(key)
    + /DELETE=(key) + /APPEND target jobs (Main.java:456-498).

    - rows matched on `on` where `delete_when` (SQL over aliases
      ``s``/``t``) holds are dropped;
    - other matched rows are replaced by the source row
      (``update="all"``), updated per-column from SQL expressions over
      ``s``/``t`` (dict), or kept (``update=None``);
    - unmatched source rows are inserted when `insert`;
    - unmatched target rows pass through untouched.

    Source and target must be schema-aligned unless
    ``evolve_schema=True``, which appends new source columns to the
    target schema (existing rows + untouched buckets read them as NULL
    via the root schema sidecar — no rewrite) and keeps target-only
    columns (matched rows retain their value, inserted rows get NULL).
    I/O follows the merge sinks' bucket discipline: only buckets
    containing source keys are read and rewritten (dynamic partition
    overwrite), so cost scales with touched buckets, not table size.
    Swaps 1:1 for a real Delta/Iceberg MERGE INTO when those libs are
    present."""
    spark = source.sparkSession
    target = Path(target_dir)
    assert_bucket_layout(target)
    staged = source.withColumn("_bucket", key_bucket(on, n_buckets)).persist()
    try:
        touched = sorted(r[0] for r in staged.select("_bucket").distinct().collect())
        if not touched:
            return
        if has_bucketed_data(target):
            current = read_merge_target(spark, target).filter(F.col("_bucket").isin(touched))
        else:
            current = spark.createDataFrame([], staged.schema)
        src_set = set(source.columns)
        tgt_data = [c for c in current.columns if c != "_bucket"]
        tgt_set = set(tgt_data)
        if src_set != tgt_set and not evolve_schema:
            raise ValueError(
                f"source/target column drift {sorted(src_set ^ tgt_set)}; pass "
                "evolve_schema=True to evolve the target"
            )
        # Evolved order: target columns first, new source columns appended.
        cols = tgt_data + [c for c in source.columns if c not in tgt_set]
        dtypes = {f.name: f.dataType for f in current.schema.fields}
        for f in source.schema.fields:
            dtypes.setdefault(f.name, f.dataType)
        s, t = staged.alias("s"), current.alias("t")
        joined = t.join(s, [t[k].eqNullSafe(s[k]) for k in on], "full_outer")
        # Presence markers must use _bucket (never null on its own
        # side), NOT the join keys: with eqNullSafe a NULL-keyed
        # source row legitimately matches a NULL-keyed target row, and
        # key-based isNotNull() would misread that pair as unmatched.
        matched = F.col("s._bucket").isNotNull() & F.col("t._bucket").isNotNull()
        s_only = F.col("t._bucket").isNull()
        # SQL MERGE deletes only where the condition is TRUE: a NULL
        # predicate result (e.g. "s.bal < 0" with NULL bal) must read
        # as not-deleted, so coalesce it — otherwise `kept` would also
        # be NULL and filter(kept) would silently drop the row.
        deleted = matched & (
            F.coalesce(F.expr(delete_when), F.lit(False)) if delete_when else F.lit(False)
        )
        kept = ~deleted & (F.lit(True) if insert else ~s_only)

        def out(col: str) -> F.Column:
            # Under evolution a column may exist on only one side; the
            # missing side reads as a typed NULL (new-column backfill
            # on target rows, target-only backfill on inserts).
            in_s, in_t = col in src_set, col in tgt_set
            s_c = F.col(f"s.{col}") if in_s else F.lit(None).cast(dtypes[col])
            t_c = F.col(f"t.{col}") if in_t else F.lit(None).cast(dtypes[col])
            if col in on:
                return F.when(s_only | matched, s_c).otherwise(t_c)
            if update == "all":
                upd = s_c if in_s else t_c  # matched rows keep target-only cols
            elif isinstance(update, dict):
                upd = F.expr(update[col]) if col in update else t_c
            else:
                upd = t_c
            return F.when(matched, upd).when(s_only, s_c).otherwise(t_c)

        merged = joined.filter(kept).select(
            *[out(c).alias(c) for c in cols],
            F.coalesce(F.col("s._bucket"), F.col("t._bucket")).alias("_bucket"),
        )
        overwrite_buckets(merged, target, ("_bucket",), touched)
        write_schema_sidecar(target, merged.schema)
    finally:
        staged.unpersist()


BATCH_TS_MANIFEST = "_batch_manifest.json"


def record_batch_ts(
    log_dir: str | Path,
    batch_id: int,
    min_ts,
    max_ts,
    dirs: Sequence[str] | None = None,
) -> None:
    """Record one landed batch's event-time range — and, when given,
    its partition DIRS (log_dir-relative) — in the changelog's root
    manifest sidecar (``_batch_manifest.json`` — underscore-prefixed,
    invisible to Spark's file listing like the schema sidecar). The
    manifest is what makes time travel METADATA-DRIVEN:
    ``read_changelog_asof`` prunes batch dirs from the manifest alone
    instead of probe-scanning ts columns, and with ``dirs`` recorded
    it resolves the kept batches to paths with ZERO directory listing
    — the role a lakehouse transaction log's per-file stats play (an
    rglob per read is an object-store list-call storm on a years-long
    changelog).

    Concurrency contract: ONE writer per log_dir. foreachBatch
    serializes triggers within a query, so read-merge-write is
    race-free under that contract; the write is atomic (tmp + rename)
    and a replayed batch MERGES its range and dir set (idempotent:
    min/max and set unions). A second concurrent writer (or a writer
    racing offline compaction's fold) can lose entries — reads stay
    CORRECT via read_changelog_asof's probe fallback, but the
    metadata pruning silently degrades; run compaction only with the
    stream stopped, as tests/test_compaction.py's protocol does."""
    import json

    root = Path(log_dir)
    root.mkdir(parents=True, exist_ok=True)
    p = root / BATCH_TS_MANIFEST
    m = json.loads(p.read_text()) if p.exists() else {}
    key = str(batch_id)
    lo, hi = (int(min_ts), int(max_ts))
    dset = set(dirs or [])
    if key in m:
        old = m[key]
        lo, hi = min(old[0], lo), max(old[1], hi)
        if len(old) > 2:
            dset |= set(old[2])
    m[key] = [lo, hi] + ([sorted(dset)] if dset else [])
    tmp = root / (BATCH_TS_MANIFEST + ".tmp")
    tmp.write_text(json.dumps(m, sort_keys=True))
    tmp.replace(p)


def batch_ts_manifest(log_dir: str | Path) -> dict[int, tuple[int, int]]:
    """Read the batch event-time manifest ({} when absent)."""
    import json

    p = Path(log_dir) / BATCH_TS_MANIFEST
    if not p.exists():
        return {}
    return {int(k): (v[0], v[1]) for k, v in json.loads(p.read_text()).items()}


def batch_dir_manifest(log_dir: str | Path) -> dict[int, list[str]]:
    """log_dir-relative partition dirs per batch, for the entries that
    recorded them (pre-dirs manifest entries are simply absent — the
    caller compares key sets against :func:`batch_ts_manifest` to
    decide whether listing can be skipped entirely)."""
    import json

    p = Path(log_dir) / BATCH_TS_MANIFEST
    if not p.exists():
        return {}
    return {
        int(k): list(v[2])
        for k, v in json.loads(p.read_text()).items()
        if len(v) > 2
    }


def fold_batch_ts_manifest(
    log_dir: str | Path,
    folded: Sequence[int],
    base_dirs: Sequence[str] | None = None,
) -> None:
    """After log compaction folds batch dirs into the compacted base,
    merge their manifest ranges into the base's entry so time travel
    keeps working across compaction (no-op when no manifest). The
    folded entries' dir lists are discarded (those dirs are deleted);
    the base entry's dirs are REPLACED by ``base_dirs`` when given
    (the compactor's post-overwrite base partition listing), else
    dropped — an entry without dirs degrades that read to the walk
    fallback, never to a wrong answer."""
    import json

    root = Path(log_dir)
    p = root / BATCH_TS_MANIFEST
    if not p.exists() or not folded:
        return
    m = json.loads(p.read_text())
    base_key = str(COMPACTED_BATCH_ID)
    ranges = [tuple(m[base_key][:2])] if base_key in m else []
    for bid in folded:
        k = str(bid)
        if k in m:
            ranges.append(tuple(m.pop(k)[:2]))
    if ranges:
        lo = min(r[0] for r in ranges)
        hi = max(r[1] for r in ranges)
        m[base_key] = [lo, hi] + ([sorted(set(base_dirs))] if base_dirs else [])
    tmp = root / (BATCH_TS_MANIFEST + ".tmp")
    tmp.write_text(json.dumps(m, sort_keys=True))
    tmp.replace(p)
