"""Explicit-schema reads for per-batch partials state dirs.

The streaming maintainers (DSIR model, word-frequency table, and any
future mergeable-partials twin) land one partition per trigger via
dynamic partition overwrite. Two EMPTY states are routine and must
not break the snapshot read (ADVICE r10 #4):

- the state dir does not exist yet (no trigger has fired, or every
  trigger so far was skipped as empty);
- a trigger wrote an empty frame — dynamic overwrite of an empty
  DataFrame emits only ``_SUCCESS``, no data files, and a
  schema-INFERRING ``spark.read.parquet`` then raises "unable to
  infer schema" until a non-empty trigger lands.

Both resolve the same way: the partials schema is FIXED per
maintainer, so read with it explicitly and return an empty frame of
that schema when the dir holds no data files.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def compact_state(
    spark,
    state_dir: str | Path,
    merge_key: tuple[str, ...],
    sum_cols: tuple[str, ...],
    keep_latest: int = 1,
) -> list:
    """Fold CLOSED per-batch partials into one SUMMED row per key in
    the compacted base partition (sinks.compact_log_batches's r11
    sum-merge mode) — the long-run maintenance every mergeable-counts
    twin needs: without it the state grows by one partial-set per
    trigger forever even though the information content is bounded by
    the key space. Snapshot reads are unchanged (summing is exactly
    what they do); the newest ``keep_latest`` batch partitions stay in
    place so an at-least-once replay still overwrites its own
    partition instead of double-counting against the base. For a
    nested ``_bucket=*/_batch_id=*`` layout, include ``_bucket`` in
    ``merge_key``. Pass an EMPTY ``merge_key`` for a global totals
    state (one summed row). Returns the folded batch ids."""
    from ripcurrent_spark.sinks import compact_log_batches

    return compact_log_batches(
        spark,
        str(state_dir),
        keep_latest=keep_latest,
        merge_key=list(merge_key),
        sum_cols=list(sum_cols),
    )


def read_state(spark, state_dir: str | Path, schema: str) -> DataFrame:
    """Read a partials dir with its fixed ``schema`` (DDL string,
    partition columns included — their dir-name values are cast to
    the declared types); an absent or data-file-free dir yields an
    empty frame of the same schema instead of an inference error."""
    p = Path(str(state_dir))
    if not p.is_dir() or not any(p.rglob("*.parquet")):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(str(p))
