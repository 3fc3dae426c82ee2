"""Bucket-scoped merge sinks: per-trigger I/O must be proportional to
touched key-hash buckets, not table size (VERDICT r1 scale-killer
fix). Untouched bucket files must be byte-identical across a merge,
and the SCD2 changelog landing must be idempotent under foreachBatch
replay (at-least-once side effects)."""

from __future__ import annotations

import hashlib
from pathlib import Path

from ripcurrent_spark.cdc.apply import scd2_history
from ripcurrent_spark.sinks import key_bucket, upsert_parquet
from ripcurrent_spark.streaming.pipeline import scd2_foreach_batch

N_BUCKETS = 8
SCHEMA = "op string, ts_ms long, id int, val string"


def _inventory(root: str) -> dict[str, str]:
    """Relative path -> content hash for every parquet file under root."""
    base = Path(root)
    return {
        str(p.relative_to(base)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in base.rglob("*.parquet")
    }


def _buckets_of(df, key_cols):
    return {
        r[0]
        for r in df.select(key_bucket(key_cols, N_BUCKETS).alias("b")).distinct().collect()
    }


def _seed_rows(n=40):
    return [("c", 100, i, f"v{i}") for i in range(n)]


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    target = str(tmp_path / "snap")
    seed = spark.createDataFrame(_seed_rows(), SCHEMA)
    upsert_parquet(seed, target, key_cols=["id"], n_buckets=N_BUCKETS)
    before = _inventory(target)
    assert len({p.split("/")[0] for p in before}) == N_BUCKETS  # all buckets populated

    batch = spark.createDataFrame([("u", 200, 1, "v1b"), ("d", 200, 2, None)], SCHEMA)
    upsert_parquet(batch, target, key_cols=["id"], n_buckets=N_BUCKETS)
    after = _inventory(target)

    touched = {f"_bucket={b}" for b in _buckets_of(batch, ["id"])}
    assert len(touched) < N_BUCKETS  # the test is vacuous otherwise
    changed = {
        p.split("/")[0]
        for p in set(before) ^ set(after) | {p for p in before if after.get(p) != before[p]}
    }
    assert changed <= touched, f"untouched bucket dirs rewritten: {changed - touched}"

    # and the merge is still correct
    snap = {r.id: r.val for r in spark.read.parquet(target).collect()}
    assert snap[1] == "v1b" and 2 not in snap and snap[3] == "v3"


def test_upsert_reads_only_touched_buckets(spark, tmp_path):
    """The snapshot-side scan must be partition-pruned to the batch's
    buckets — check the pruning predicate survives into the plan."""
    target = str(tmp_path / "snap")
    upsert_parquet(spark.createDataFrame(_seed_rows(), SCHEMA), target, key_cols=["id"], n_buckets=N_BUCKETS)
    import pyspark.sql.functions as F

    touched = sorted(_buckets_of(spark.createDataFrame([("u", 200, 1, "x")], SCHEMA), ["id"]))
    pruned = spark.read.parquet(target).filter(F.col("_bucket").isin(touched))
    # input_file_name() reflects the files actually scanned after
    # partition pruning (inputFiles() reports the pre-pruning index)
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files and all(f"_bucket={touched[0]}" in f for f in files)


def test_scd2_sink_bucket_scoped_and_replay_idempotent(spark, tmp_path):
    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    sink = scd2_foreach_batch(log_dir, hist_dir, key_cols=["id"], order_cols=["ts_ms"], n_buckets=N_BUCKETS)

    sink(spark.createDataFrame(_seed_rows(), SCHEMA), 0)
    before = _inventory(hist_dir)

    batch1 = spark.createDataFrame([("u", 200, 1, "v1b"), ("d", 250, 2, None)], SCHEMA)
    sink(batch1, 1)
    after = _inventory(hist_dir)
    touched = {f"_bucket={b}" for b in _buckets_of(batch1, ["id"])}
    assert len(touched) < N_BUCKETS
    changed = {
        p.split("/")[0]
        for p in set(before) ^ set(after) | {p for p in before if after.get(p) != before[p]}
    }
    assert changed <= touched, f"untouched bucket dirs rewritten: {changed - touched}"

    # foreachBatch replays batches after failures: re-running batch 1
    # must change NOTHING (log partitions overwritten in place, splice
    # deterministic) — the at-least-once duplicate-log bug.
    hist_rows = lambda: sorted(
        (r.id, r.valid_from, r.valid_to, r.is_current, r.val)
        for r in spark.read.parquet(hist_dir).collect()
    )
    log_count = spark.read.parquet(log_dir).count()
    first = hist_rows()
    sink(batch1, 1)  # replay
    assert spark.read.parquet(log_dir).count() == log_count
    assert hist_rows() == first

    # and incremental == batch over the full event run
    all_rows = _seed_rows() + [("u", 200, 1, "v1b"), ("d", 250, 2, None)]
    expected = scd2_history(
        spark.createDataFrame(all_rows, SCHEMA), key_cols=["id"], order_cols=["ts_ms"]
    )
    exp = sorted(
        (r.id, r.valid_from, r.valid_to, r.is_current, r.val) for r in expected.collect()
    )
    assert hist_rows() == exp
