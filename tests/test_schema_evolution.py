"""Schema evolution through the merge sinks: a changelog/source that
gains columns mid-stream (upstream ALTER TABLE — the reference logs
the DDL event, Main.java:293-310; this is the apply side) widens the
bucketed target in place. New columns backfill NULL on existing rows,
untouched bucket files are never rewritten (the evolved schema lives
in a root sidecar), and without the opt-in flag drift raises instead
of corrupting."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

from ripcurrent_spark.sinks import (
    key_bucket,
    merge_into,
    read_merge_target,
    target_schema,
    upsert_parquet,
)
from ripcurrent_spark.streaming.pipeline import upsert_foreach_batch

N_BUCKETS = 8
CDC = "op string, ts_ms long, id int, val string"
CDC_WIDE = CDC + ", email string"


def _inventory(root: str) -> dict[str, str]:
    base = Path(root)
    return {
        str(p.relative_to(base)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in base.rglob("*.parquet")
    }


def test_upsert_drift_raises_without_flag(spark, tmp_path):
    target = str(tmp_path / "t")
    upsert_parquet(
        spark.createDataFrame([("c", 100, 1, "a")], CDC), target, key_cols=["id"],
        n_buckets=N_BUCKETS,
    )
    wide = spark.createDataFrame([("u", 200, 1, "a2", "a@x.com")], CDC_WIDE)
    with pytest.raises(ValueError, match="drift.*email"):
        upsert_parquet(wide, target, key_cols=["id"], n_buckets=N_BUCKETS)


def test_upsert_evolves_schema_null_backfill_no_rewrite(spark, tmp_path):
    target = str(tmp_path / "t")
    # Seed enough keys that several buckets exist and most stay untouched.
    seed = spark.createDataFrame([("c", 100, i, f"v{i}") for i in range(32)], CDC)
    upsert_parquet(seed, target, key_cols=["id"], n_buckets=N_BUCKETS)
    before = _inventory(target)

    wide = spark.createDataFrame([("u", 200, 1, "v1b", "one@x.com")], CDC_WIDE)
    upsert_parquet(wide, target, key_cols=["id"], n_buckets=N_BUCKETS, evolve_schema=True)

    snap = {r.id: (r.val, r.email) for r in read_merge_target(spark, target).collect()}
    assert len(snap) == 32
    assert snap[1] == ("v1b", "one@x.com")       # merged row carries new col
    assert snap[2] == ("v2", None)               # untouched row: NULL backfill
    # Untouched buckets byte-identical — evolution did not rewrite them.
    after = _inventory(target)
    touched = {
        f"_bucket={r[0]}"
        for r in wide.select(key_bucket(["id"], N_BUCKETS).alias("b")).distinct().collect()
    }
    changed = {p.split("/")[0] for p in set(before) ^ set(after)} | {
        p.split("/")[0] for p in before if after.get(p) not in (None, before[p])
    }
    assert changed <= touched, f"untouched buckets rewritten: {changed - touched}"
    # Sidecar records the evolved schema (target order + appended col).
    ts = target_schema(target)
    assert ts is not None and ts.names[:5] == ["op", "ts_ms", "id", "val", "email"]

    # A later NARROW batch (pre-DDL replica lagging) still merges:
    # its rows read the evolved column as NULL.
    upsert_parquet(
        spark.createDataFrame([("u", 300, 2, "v2c")], CDC),
        target, key_cols=["id"], n_buckets=N_BUCKETS, evolve_schema=True,
    )
    snap = {r.id: (r.val, r.email) for r in read_merge_target(spark, target).collect()}
    assert snap[2] == ("v2c", None)
    assert snap[1] == ("v1b", "one@x.com")


def test_merge_into_evolution_matched_insert_and_target_only(spark, tmp_path):
    target = str(tmp_path / "t")
    base = "id int, name string, bal double"
    merge_into(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], base),
        target, on=["id"], n_buckets=N_BUCKETS,
    )
    # Widened source: new column `tier` appends; update + insert.
    wide = spark.createDataFrame(
        [(1, "a2", 10.0, "gold"), (3, "c", 3.0, "silver")], base + ", tier string"
    )
    with pytest.raises(ValueError, match="drift.*tier"):
        merge_into(wide, target, on=["id"], n_buckets=N_BUCKETS)
    merge_into(wide, target, on=["id"], n_buckets=N_BUCKETS, evolve_schema=True)
    rows = {r.id: (r.name, r.bal, r.tier) for r in read_merge_target(spark, target).collect()}
    assert rows == {
        1: ("a2", 10.0, "gold"),   # matched: replaced + new col
        2: ("b", 2.0, None),       # unmatched target: NULL backfill
        3: ("c", 3.0, "silver"),   # inserted with new col
    }

    # Narrowed source (missing `tier` AND `bal`): matched rows keep
    # the target-only values, inserted rows get NULL for them.
    narrow = spark.createDataFrame([(1, "a3"), (4, "d")], "id int, name string")
    merge_into(narrow, target, on=["id"], n_buckets=N_BUCKETS, evolve_schema=True)
    rows = {r.id: (r.name, r.bal, r.tier) for r in read_merge_target(spark, target).collect()}
    assert rows[1] == ("a3", None, None) or rows[1] == ("a3", 10.0, "gold")
    # update="all" replaces the row with the source row; target-only
    # columns RETAIN their target value on matched rows:
    assert rows[1] == ("a3", 10.0, "gold")
    assert rows[4] == ("d", None, None)
    assert rows[2] == ("b", 2.0, None)


def test_cdc_stream_gains_column_mid_stream(spark, tmp_path):
    """The CDC path end-to-end shape: batch 0 applies the original
    schema, batch 1 arrives post-ALTER with an extra column, batch 2
    replays (at-least-once) — snapshot stays correct throughout."""
    target = str(tmp_path / "snap")
    sink = upsert_foreach_batch(
        target, key_cols=["id"], n_buckets=N_BUCKETS, evolve_schema=True
    )
    b0 = spark.createDataFrame(
        [("c", 100, 1, "a"), ("c", 100, 2, "b"), ("c", 100, 3, "x")], CDC
    )
    b1 = spark.createDataFrame(
        [("u", 200, 1, "a2", "a@x.com"), ("d", 200, 3, None, None)], CDC_WIDE
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay must be idempotent across the evolution
    snap = {r.id: (r.val, r.email) for r in read_merge_target(spark, target).collect()}
    assert snap == {1: ("a2", "a@x.com"), 2: ("b", None)}
