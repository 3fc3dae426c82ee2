"""MERGE INTO facade semantics: matched-update / matched-delete /
not-matched-insert in one call, with the bucket discipline (untouched
bucket files byte-identical)."""

from __future__ import annotations

import hashlib
from pathlib import Path

from ripcurrent_spark.sinks import key_bucket, merge_into

N_BUCKETS = 8
SCHEMA = "id int, name string, bal double"


def _inventory(root: str) -> dict[str, str]:
    base = Path(root)
    return {
        str(p.relative_to(base)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in base.rglob("*.parquet")
    }


def _snap(spark, target):
    return {r.id: (r.name, r.bal) for r in spark.read.parquet(target).collect()}


def test_merge_update_delete_insert(spark, tmp_path):
    target = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)], SCHEMA
    )
    merge_into(seed, target, on=["id"], n_buckets=N_BUCKETS)
    assert _snap(spark, target) == {i: (f"n{i}", float(i)) for i in range(20)}
    before = _inventory(target)

    src = spark.createDataFrame(
        [(1, "upd", 100.0), (2, "del", -1.0), (99, "new", 9.0)], SCHEMA
    )
    merge_into(src, target, on=["id"], delete_when="s.bal < 0", n_buckets=N_BUCKETS)
    snap = _snap(spark, target)
    assert snap[1] == ("upd", 100.0)   # matched -> replaced by source
    assert 2 not in snap               # matched + delete_when -> dropped
    assert snap[99] == ("new", 9.0)    # not matched -> inserted
    assert snap[3] == ("n3", 3.0)      # untouched key unchanged

    after = _inventory(target)
    touched = {
        f"_bucket={r[0]}"
        for r in src.select(key_bucket(["id"], N_BUCKETS).alias("b")).distinct().collect()
    }
    changed = {p.split("/")[0] for p in set(before) ^ set(after)} | {
        p.split("/")[0] for p in before if after.get(p) not in (None, before[p])
    }
    assert changed <= touched, f"untouched buckets rewritten: {changed - touched}"


def test_merge_partial_update_and_no_insert(spark, tmp_path):
    target = str(tmp_path / "t")
    merge_into(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA),
        target,
        on=["id"],
        n_buckets=N_BUCKETS,
    )
    src = spark.createDataFrame([(1, "ignored", 10.0), (3, "ghost", 3.0)], SCHEMA)
    merge_into(
        src,
        target,
        on=["id"],
        update={"bal": "t.bal + s.bal"},  # name keeps target value
        insert=False,
        n_buckets=N_BUCKETS,
    )
    snap = _snap(spark, target)
    assert snap == {1: ("a", 11.0), 2: ("b", 2.0)}  # no ghost insert


def test_merge_all_rows_deleted_drops_bucket_dir(spark, tmp_path):
    target = str(tmp_path / "t")
    merge_into(spark.createDataFrame([(1, "a", 1.0)], SCHEMA), target, on=["id"], n_buckets=N_BUCKETS)
    merge_into(
        spark.createDataFrame([(1, "a", -5.0)], SCHEMA),
        target,
        on=["id"],
        delete_when="s.bal < 0",
        n_buckets=N_BUCKETS,
    )
    assert not list(Path(target).glob("_bucket=*"))  # stale dir removed


def test_merge_null_keys_match_null_safely(spark, tmp_path):
    """NULL join keys must merge (eqNullSafe), not silently duplicate:
    a NULL-keyed source row updates the existing NULL-keyed target
    row instead of inserting a second one."""
    target = str(tmp_path / "t")
    merge_into(
        spark.createDataFrame([(None, "nullrow", 1.0), (1, "a", 1.0)], SCHEMA),
        target,
        on=["id"],
        n_buckets=N_BUCKETS,
    )
    merge_into(
        spark.createDataFrame([(None, "updated", 2.0)], SCHEMA),
        target,
        on=["id"],
        n_buckets=N_BUCKETS,
    )
    rows = sorted(
        ((r.id, r.name, r.bal) for r in spark.read.parquet(target).collect()),
        key=lambda x: (x[0] is None, x[0]),
    )
    assert rows == [(1, "a", 1.0), (None, "updated", 2.0)]


def test_merge_null_key_partial_update_no_insert(spark, tmp_path):
    """The confirmed round-2 review repro: with a NULL-keyed target
    row, an update-dict merge with insert=False must UPDATE that row
    (null-safe match), not silently delete it."""
    target = str(tmp_path / "t")
    merge_into(
        spark.createDataFrame([(None, "nullrow", 5.0), (1, "a", 1.0)], SCHEMA),
        target,
        on=["id"],
        n_buckets=N_BUCKETS,
    )
    merge_into(
        spark.createDataFrame([(None, "src", 2.0)], SCHEMA),
        target,
        on=["id"],
        update={"bal": "t.bal + s.bal"},
        insert=False,
        n_buckets=N_BUCKETS,
    )
    rows = sorted(
        ((r.id, r.name, r.bal) for r in spark.read.parquet(target).collect()),
        key=lambda x: (x[0] is None, x[0]),
    )
    assert rows == [(1, "a", 1.0), (None, "nullrow", 7.0)]


def test_merge_null_delete_predicate_keeps_row(spark, tmp_path):
    """A delete_when that evaluates to NULL (not FALSE) on a matched
    row must read as not-deleted — SQL MERGE deletes only where the
    condition is TRUE. Regression: NULL predicate used to propagate
    into `kept` and filter() silently dropped the row."""
    target = str(tmp_path / "t")
    merge_into(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA),
        target,
        on=["id"],
        n_buckets=N_BUCKETS,
    )
    src = spark.createDataFrame([(1, "upd", None), (2, "del", -1.0)], SCHEMA)
    merge_into(src, target, on=["id"], delete_when="s.bal < 0", n_buckets=N_BUCKETS)
    snap = _snap(spark, target)
    assert 2 not in snap                 # TRUE predicate still deletes
    assert snap[1] == ("upd", None)      # NULL predicate -> kept + updated


def test_merge_refuses_partitioned_legacy_layout(spark, tmp_path):
    """A target partitioned by anything other than _bucket= (part
    files in subdirs, nothing at root level) must also be rejected —
    root-glob-only detection used to read it as an empty target."""
    import pytest

    target = str(tmp_path / "legacy_part")
    spark.createDataFrame(
        [(1, "a", 1.0, "2024-01-01")], SCHEMA + ", dt string"
    ).write.partitionBy("dt").parquet(target)
    with pytest.raises(ValueError, match="non-bucketed"):
        merge_into(
            spark.createDataFrame([(2, "b", 2.0)], SCHEMA),
            target,
            on=["id"],
            n_buckets=N_BUCKETS,
        )


def test_merge_refuses_non_bucketed_target(spark, tmp_path):
    """A directory holding a plain (root part files) parquet layout
    must be rejected, not silently treated as an empty target."""
    import pytest

    target = str(tmp_path / "legacy")
    spark.createDataFrame([(1, "a", 1.0)], SCHEMA).write.parquet(target)
    with pytest.raises(ValueError, match="non-bucketed"):
        merge_into(
            spark.createDataFrame([(2, "b", 2.0)], SCHEMA),
            target,
            on=["id"],
            n_buckets=N_BUCKETS,
        )
    from ripcurrent_spark.sinks import upsert_parquet

    with pytest.raises(ValueError, match="non-bucketed"):
        upsert_parquet(
            spark.createDataFrame([("c", 1, 2, "x")], "op string, ts_ms long, id int, val string"),
            target,
            key_cols=["id"],
        )


def test_merge_tmp_stage_removed(spark, tmp_path):
    target = str(tmp_path / "t")
    merge_into(spark.createDataFrame([(1, "a", 1.0)], SCHEMA), target, on=["id"], n_buckets=N_BUCKETS)
    assert not Path(target + ".tmp").exists()
