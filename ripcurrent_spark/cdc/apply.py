"""CDC apply semantics: changelog -> target state.

The reference routes each event to a generated per-(table, op) SortCL
job: append for inserts, ``/UPDATE=(key)`` for updates, ``/DELETE=
(key)`` for deletes (Main.java:456-498). Spark-first, the same
semantics are ONE declarative plan over the whole changelog:

- snapshot  = latest event per key (single shuffle on the key), drop
  keys whose latest op is a delete;
- SCD2      = every non-delete event becomes a validity interval
  [ts, next-event ts) via one window pass.

At 100 TB the shuffle on the key is the only data movement; AQE
handles skewed hot keys, and the streaming twin (cdc/pipeline.py)
maintains the same snapshot incrementally per micro-batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def latest_snapshot(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms", "seq"),
    op_col: str = "op",
) -> DataFrame:
    """Apply c/u/d events: keep the latest event per key (ordered by
    ``order_cols``), drop keys whose latest event is a delete."""
    w = W.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "d"))
        .drop("_rn")
    )


def latest_snapshot_salted(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms", "seq"),
    op_col: str = "op",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-hardened twin of :func:`latest_snapshot` — same output,
    different shuffle shape for the hot-key-update workload a real CDC
    stream has (one account/session/device key receiving a large share
    of updates makes the window's single shuffle-by-key put that whole
    key in one reducer; AQE can split skewed PARTITIONS but not one
    key's row group).

    Two-phase max-by (the q_salted_brand_revenue pattern applied to
    latest-per-key): events first reduce per (key, salt) where the
    salt spreads a key's events by hash of its order columns, then the
    <= n_salts per-key candidates reduce to one. Both phases are hash
    AGGREGATES, so phase 1 partially aggregates map-side before the
    shuffle — a hot key ships at most n_salts rows per upstream
    partition instead of every event.

    The latest row is selected with max_by over the order_cols struct:
    only the ORDERING needs an orderable type, so the carried row may
    contain map/array columns (a packed-struct max would reject a
    parse_envelope-shaped changelog whose row_payload is a map —
    struct comparison cannot order maps). Ties on order_cols resolve
    arbitrarily, exactly like the window twin's row_number tie; order
    keys are unique per key in a well-formed changelog (ts, seq).
    All-NULL order cols are a tie too — the ordering STRUCT is never
    NULL (struct(NULL, NULL) is a non-NULL value max_by orders NULLs-
    low), so a key whose every event has NULL order cols still emits
    exactly one row, same as the window twin (pinned in
    tests/test_cdc.py); WHICH of the tied rows wins may differ
    between the twins, as for any tie."""
    cols = changelog.columns
    clash = {"_salt", "_row"} & set(cols)
    if clash:
        # Internal names would silently shadow same-named changelog
        # columns through the struct repack.
        raise ValueError(f"changelog already has internal column(s) {sorted(clash)}")
    salt = F.pmod(F.hash(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    ordering = F.struct(*[F.col(c) for c in order_cols])
    row = F.struct(*[F.col(c) for c in cols])
    per_salt = (
        changelog.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.max_by(row, ordering).alias("_row"))
    )
    ordering2 = F.struct(*[F.col(f"_row.{c}") for c in order_cols])
    latest = per_salt.groupBy(*key_cols).agg(F.max_by("_row", ordering2).alias("_row"))
    return latest.select("_row.*").filter(F.col(op_col) != "d")


def scd2_history(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str] = ("ts_ms", "seq"),
    op_col: str = "op",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Slowly-changing-dimension type 2: each non-delete event becomes
    a version with [valid_from, valid_to) in the ``ts_col`` domain;
    open intervals (valid_to NULL) are current. A delete closes the
    last interval without emitting a row."""
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    with_next = changelog.withColumn("_next_ts", F.lead(F.col(ts_col)).over(w))
    return (
        with_next.filter(F.col(op_col) != "d")
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.col("_next_ts"))
        .withColumn("is_current", F.col("_next_ts").isNull())
        .drop("_next_ts")
    )


def read_changelog_asof(
    spark,
    log_dir: str,
    cutoff,
    ts_col: str = "ts_ms",
    batch_col: str = "_batch_id",
) -> DataFrame:
    """Time-travel read of a ``_batch_id``-partitioned changelog with
    BATCH-DIR pruning: only batch partitions containing rows at or
    before the cutoff are listed, so a column added by a later batch
    (mid-stream upstream ALTER TABLE, landed via evolve_schema sinks)
    never surfaces in the as-of schema — the as-of snapshot has the
    schema the table had at that time. Under monotone ingestion the
    kept set is a batch-id prefix.

    The kept set is decided METADATA-FIRST: batches listed in the
    log's ``_batch_manifest.json`` sidecar (event-time ranges AND
    partition dirs recorded at landing by ``sinks.record_batch_ts``;
    merged across compaction by ``fold_batch_ts_manifest``) are pruned
    without touching data — the role a lakehouse transaction log's
    file stats play. When every manifest entry also carries its dir
    list, the kept batches resolve to paths with ZERO directory
    listing (an rglob per read is an object-store list-call storm on
    a years-long changelog); that path relies on the manifest's
    single-writer contract — a batch dir landed by a foreign writer
    that bypassed record_batch_ts is invisible to it (delete the
    sidecar to force the walk). A crash between the parquet landing
    and the manifest record leaves the batch out until the replay
    re-lands it — read-committed semantics, strictly better than
    surfacing a half-landed batch. Entries missing dirs (pre-r5
    manifests) or batch dirs missing from the manifest entirely
    (pre-manifest layouts) fall back to one recursive walk, plus one
    column-pruned probe scan of (batch, ts) over just the unknown
    dirs."""
    from pathlib import Path

    from ripcurrent_spark.sinks import batch_dir_manifest, batch_ts_manifest

    root = Path(log_dir)
    manifest = batch_ts_manifest(log_dir)
    dirmap = batch_dir_manifest(log_dir)
    if manifest and set(dirmap) >= set(manifest):
        keep = sorted(b for b in manifest if manifest[b][0] <= cutoff)
        dirs = [str(root / d) for b in keep for d in dirmap[b]]
        if not dirs:
            raise ValueError(f"no changelog batches at or before cutoff {cutoff!r}")
        # Crash-window guard: _finish_log_compaction deletes folded
        # batch dirs BEFORE folding the manifest, so a crash between
        # the two leaves entries pointing at deleted dirs — the fast
        # path would then fail mid-scan with path-not-found until
        # compaction recovery runs. One cheap stat per kept dir (not a
        # listing — the zero-rglob contract holds) detects the window;
        # any missing dir falls back to the recursive-walk path below,
        # which reads only what actually exists.
        if all(Path(p).is_dir() for p in dirs):
            return (
                spark.read.option("mergeSchema", "true")
                .option("basePath", log_dir)
                .parquet(*dirs)
                .filter(F.col(ts_col) <= cutoff)
            )
    # ONE recursive walk builds {batch_id: [dirs]}; every later step
    # (manifest decisions, probe fallback, final listing) consumes the
    # map — a per-batch rglob would traverse the whole log tree O(B)
    # times on a long-lived changelog.
    by_id: dict[int, list[str]] = {}
    for d in sorted(root.rglob(f"{batch_col}=*")):
        by_id.setdefault(int(d.name.split("=", 1)[1]), []).append(str(d))
    keep = [b for b in by_id if b in manifest and manifest[b][0] <= cutoff]
    unknown = [b for b in by_id if b not in manifest]
    if unknown:
        udirs = [p for bid in unknown for p in by_id[bid]]
        probe = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", str(root))
            .parquet(*udirs)
            .groupBy(batch_col)
            .agg(F.min(ts_col).alias("_lo"))
            .collect()
        )
        keep += [
            r[batch_col] for r in probe if r["_lo"] is not None and r["_lo"] <= cutoff
        ]
    dirs = [p for bid in sorted(set(keep)) for p in by_id[bid]]
    if not dirs:
        raise ValueError(f"no changelog batches at or before cutoff {cutoff!r}")
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", log_dir)
        .parquet(*dirs)
        .filter(F.col(ts_col) <= cutoff)
    )


def changelog_counts(changelog: DataFrame, op_col: str = "op", table_col: str | None = None) -> DataFrame:
    """Replication audit: event counts + ts range per (table,) op."""
    keys = ([table_col] if table_col else []) + [op_col]
    return changelog.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("min_ts_ms"),
        F.max("ts_ms").alias("max_ts_ms"),
    )
