"""Offline compaction for bucket-partitioned merge targets: fat
snapshot buckets collapse to one file each (content preserved,
thin buckets byte-identical), and old changelog batch partitions fold
into the compacted base without changing SCD2 history or breaking
replay idempotence."""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from ripcurrent_spark.sinks import (
    COMPACTED_BATCH_ID,
    compact_log_batches,
    compact_snapshot_buckets,
    upsert_parquet,
)
from ripcurrent_spark.streaming.pipeline import scd2_foreach_batch

N_BUCKETS = 8
SCHEMA = "op string, ts_ms long, id int, val string"


def _inventory(root: str) -> dict[str, str]:
    base = Path(root)
    return {
        str(p.relative_to(base)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in base.rglob("*.parquet")
    }


def _rows(df):
    return sorted((r.id, r.val) for r in df.collect())


def test_snapshot_compaction_single_file_same_rows(spark, tmp_path):
    target = str(tmp_path / "snap")
    from ripcurrent_spark.sinks import key_bucket

    seed = spark.createDataFrame([("c", 100, i, f"v{i}") for i in range(64)], SCHEMA)
    # Fragment the bucket dirs the way an append-style writer does:
    # 16 random-split tasks each write a sliver of every bucket.
    (
        seed.withColumn("_bucket", key_bucket(["id"], N_BUCKETS))
        .repartition(16)
        .write.partitionBy("_bucket")
        .parquet(target)
    )

    before_rows = _rows(spark.read.parquet(target))
    before = _inventory(target)
    fat = {
        d.name
        for d in Path(target).glob("_bucket=*")
        if len(list(d.glob("*.parquet"))) >= 2
    }
    assert fat, "fixture vacuous: no bucket holds multiple files"

    compacted = compact_snapshot_buckets(spark, target, min_files=2)
    assert {f"_bucket={b}" for b in compacted} == fat

    after = _inventory(target)
    for d in Path(target).glob("_bucket=*"):
        assert len(list(d.glob("*.parquet"))) == 1  # every bucket now 1 file
    # Thin buckets byte-identical; content globally unchanged.
    thin = {p for p in before if p.split("/")[0] not in fat}
    assert all(after.get(p) == before[p] for p in thin)
    assert _rows(spark.read.parquet(target)) == before_rows
    assert not Path(target + ".tmp").exists()  # stage dir cleaned up


def test_log_compaction_preserves_history_and_replay(spark, tmp_path):
    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    sink = scd2_foreach_batch(log_dir, hist_dir, key_cols=["id"], n_buckets=N_BUCKETS)
    b0 = spark.createDataFrame([("c", 100, 1, "a"), ("c", 100, 2, "b")], SCHEMA)
    b1 = spark.createDataFrame([("u", 200, 1, "a2")], SCHEMA)
    b2 = spark.createDataFrame([("u", 300, 2, "b2")], SCHEMA)
    for i, b in enumerate((b0, b1, b2)):
        sink(b, i)

    hist_before = sorted(
        (r.id, r.val, r.valid_from, r.valid_to)
        for r in spark.read.parquet(hist_dir).drop("_bucket").collect()
    )
    log_rows_before = spark.read.parquet(log_dir).count()

    folded = compact_log_batches(spark, log_dir, keep_latest=1)
    assert folded == [0, 1]
    ids = {
        int(d.name.split("=", 1)[1]) for d in Path(log_dir).glob("_bucket=*/_batch_id=*")
    }
    assert ids == {COMPACTED_BATCH_ID, 2}
    assert spark.read.parquet(log_dir).count() == log_rows_before

    # Replay of the latest (kept) batch after compaction: still
    # idempotent, history unchanged.
    sink(b2, 2)
    hist_after = sorted(
        (r.id, r.val, r.valid_from, r.valid_to)
        for r in spark.read.parquet(hist_dir).drop("_bucket").collect()
    )
    assert hist_after == hist_before
    assert spark.read.parquet(log_dir).count() == log_rows_before


def _seed_log(spark, tmp_path, n_batches=3):
    log_dir, hist_dir = str(tmp_path / "log"), str(tmp_path / "hist")
    sink = scd2_foreach_batch(log_dir, hist_dir, key_cols=["id"], n_buckets=N_BUCKETS)
    for i in range(n_batches):
        sink(spark.createDataFrame([("u", 100 * (i + 1), j, f"v{i}.{j}") for j in range(4)], SCHEMA), i)
    return log_dir


def _log_rows(spark, log_dir):
    return sorted(
        (r.op, r.ts_ms, r.id, r.val) for r in spark.read.parquet(log_dir).collect()
    )


def test_log_compaction_recovers_from_crash_after_swap(spark, tmp_path, monkeypatch):
    """Crash between the base swap and fold-dir deletion must NOT
    duplicate rows on the next run: the sealed stage tells recovery
    the fold content is already in the base, so the next compactor
    run deletes the leftover fold dirs instead of re-folding them."""
    import shutil as real_shutil

    log_dir = _seed_log(spark, tmp_path)
    rows_before = _log_rows(spark, log_dir)

    orig_rmtree = real_shutil.rmtree

    def crashing_rmtree(path, *a, **kw):
        if "_batch_id=" in str(path):
            raise RuntimeError("simulated crash before fold-dir deletion")
        return orig_rmtree(path, *a, **kw)

    monkeypatch.setattr(real_shutil, "rmtree", crashing_rmtree)
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_log_batches(spark, log_dir, keep_latest=1)
    monkeypatch.setattr(real_shutil, "rmtree", orig_rmtree)

    # Half-done state on disk: base written AND fold dirs still present
    # -> a naive re-fold would duplicate. Recovery must converge.
    folded = compact_log_batches(spark, log_dir, keep_latest=1)
    assert folded == [0, 1]
    ids = {
        int(d.name.split("=", 1)[1]) for d in Path(log_dir).glob("_bucket=*/_batch_id=*")
    }
    assert ids == {COMPACTED_BATCH_ID, 2}
    assert _log_rows(spark, log_dir) == rows_before
    assert not Path(log_dir + ".compact_stage").exists()

    # And again: a third run with nothing to fold is a no-op.
    assert compact_log_batches(spark, log_dir, keep_latest=1) == []
    assert _log_rows(spark, log_dir) == rows_before


def test_log_compaction_discards_unsealed_stage(spark, tmp_path):
    """A stage dir without a manifest (crash mid-stage-write) is
    discarded and the fold redone from the untouched log."""
    log_dir = _seed_log(spark, tmp_path)
    rows_before = _log_rows(spark, log_dir)
    stage = Path(log_dir + ".compact_stage")
    stage.mkdir()
    (stage / "part-junk.parquet").write_bytes(b"not a parquet file")

    folded = compact_log_batches(spark, log_dir, keep_latest=1)
    assert folded == [0, 1]
    assert _log_rows(spark, log_dir) == rows_before
    assert not stage.exists()
