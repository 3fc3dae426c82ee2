"""Round-4 operator hardening tests: hot-band candidate caps and the
anti-join form of the inverted-index document-frequency guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.operators.dedup import candidate_pairs_by_key
from ripcurrent_spark.queries.dedup import _SH_MAX_DF, _capped_bands


def test_capped_bands_drops_hot_band_groups(spark):
    """A planted identical-fingerprint cluster larger than _SH_MAX_DF
    contributes ZERO band rows to candidate generation (bounded work,
    not quadratic pairs), while small groups are untouched."""
    n_hot = _SH_MAX_DF + 200
    rows = [(i, 111, 222, 333, 444) for i in range(n_hot)] + [
        (1_000_000, 555, 666, 777, 888),
        (1_000_001, 555, 666, 777, 888),
        (1_000_002, 999, 111, 222, 333),
    ]
    t = spark.createDataFrame(
        rows, "doc_id long, sh_a long, sh_b long, sh_c long, sh_d long"
    )
    kept = _capped_bands(t)
    ids = {r.doc_id for r in kept.select("doc_id").distinct().collect()}
    assert ids == {1_000_000, 1_000_001, 1_000_002}
    # The surviving pair join is tiny: exactly the planted 2-doc group.
    a = kept.select(F.col("doc_id").alias("id_a"), "b", "bval")
    b = kept.select(F.col("doc_id").alias("id_b"), "b", "bval")
    pairs = (
        a.join(b, ["b", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    )
    assert {(r.id_a, r.id_b) for r in pairs} == {(1_000_000, 1_000_001)}


def test_capped_bands_keeps_groups_at_cap(spark):
    """Groups of exactly _SH_MAX_DF docs survive (the cap is a strict
    > threshold, mirroring the oracle's COUNT(*) <= cap window)."""
    rows = [(i, 777, 888, 999, 111) for i in range(_SH_MAX_DF)]
    t = spark.createDataFrame(
        rows, "doc_id long, sh_a long, sh_b long, sh_c long, sh_d long"
    )
    assert _capped_bands(t).count() == _SH_MAX_DF * 4  # 4 bands each


def test_candidate_pairs_max_df_anti_join_semantics(spark):
    """The df guard keeps keys at the cap, drops keys above it, and
    never emits pairs through a dropped key — identical semantics to
    the old kept-set inner join, now via a hot-set anti-join."""
    rows = (
        [(i, "hot") for i in range(5)]
        + [(10, "warm"), (11, "warm")]
        + [(20, "cold")]
    )
    keyed = spark.createDataFrame(rows, "doc_id long, k string")
    pairs = candidate_pairs_by_key(keyed, "doc_id", "k", max_df=2).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(10, 11)}
    # Without a cap the hot key contributes all 10 pairs.
    pairs_all = candidate_pairs_by_key(keyed, "doc_id", "k").collect()
    assert len(pairs_all) == 10 + 1


# ----------------------------------------------------- salted CDC apply
def _changelog(spark):
    rows = []
    # hot key 1: many updates; key 2: create+delete; key 3: one create
    for i in range(200):
        rows.append(("u" if i else "c", 1000 + i, i, 1, f"v{i}"))
    rows += [("c", 1000, 900, 2, "b0"), ("d", 2000, 901, 2, None)]
    rows += [("c", 1500, 950, 3, "c0")]
    return spark.createDataFrame(
        rows, "op string, ts_ms long, seq long, id long, val string"
    )


def test_latest_snapshot_salted_equals_window_path(spark):
    from ripcurrent_spark.cdc.apply import latest_snapshot, latest_snapshot_salted

    log = _changelog(spark)
    want = sorted(
        (r.id, r.ts_ms, r.seq, r.val)
        for r in latest_snapshot(log, ["id"], ("ts_ms", "seq")).collect()
    )
    got = sorted(
        (r.id, r.ts_ms, r.seq, r.val)
        for r in latest_snapshot_salted(log, ["id"], ("ts_ms", "seq")).collect()
    )
    assert got == want
    assert [r[0] for r in got] == [1, 3]  # delete dropped


def test_latest_snapshot_salted_plan_two_phase(spark):
    """The salted path must be two hash AGGREGATES (partial map-side
    combine bounds a hot key's shuffle rows) with no Window."""
    from ripcurrent_spark.cdc.apply import latest_snapshot_salted

    qe = latest_snapshot_salted(_changelog(spark), ["id"])._jdf.queryExecution()
    logical = qe.optimizedPlan().toString()
    assert "Window" not in logical
    assert logical.count("Aggregate") == 2  # per-(key,salt), then per-key


# -------------------------------------- schema evolution + time travel
def test_schema_evolution_with_time_travel(spark, tmp_path):
    """A changelog gains a column mid-stream (upstream ALTER TABLE):
    the evolve_schema upsert target widens with null backfill, while
    an as-of read from BEFORE the add prunes the later batch dirs and
    does NOT surface the new column."""
    from pyspark.sql import functions as F

    from ripcurrent_spark.cdc.apply import latest_snapshot, read_changelog_asof
    from ripcurrent_spark.sinks import read_merge_target, upsert_parquet

    log = str(tmp_path / "log")
    snap = str(tmp_path / "snap")
    b1 = spark.createDataFrame(
        [("c", 100, 1, 1, "x1"), ("c", 110, 2, 2, "x2")],
        "op string, ts_ms long, seq long, id long, a string",
    )
    b2 = spark.createDataFrame(
        [("u", 200, 3, 1, "x1b", "n1"), ("c", 210, 4, 3, "x3", "n3")],
        "op string, ts_ms long, seq long, id long, a string, b string",
    )
    for i, batch in enumerate([b1, b2]):
        batch.withColumn("_batch_id", F.lit(i)).write.mode("append").partitionBy(
            "_batch_id"
        ).parquet(log)
        upsert_parquet(batch, snap, key_cols=["id"], n_buckets=4, evolve_schema=True)

    # Current snapshot: widened schema, null backfill for pre-add rows.
    cur = {r.id: r for r in read_merge_target(spark, snap).collect()}
    assert set(cur) == {1, 2, 3}
    assert cur[1].b == "n1" and cur[3].b == "n3" and cur[2].b is None

    # As-of BEFORE the add: batch 1 pruned away, no `b` column at all.
    asof = read_changelog_asof(spark, log, 150)
    assert "b" not in asof.columns
    old = {r.id: r for r in latest_snapshot(asof, ["id"], ("ts_ms", "seq")).collect()}
    assert set(old) == {1, 2} and old[1].a == "x1"

    # As-of AFTER the add sees the evolved schema and latest values.
    later = read_changelog_asof(spark, log, 10_000)
    assert "b" in later.columns
    new = {r.id: r for r in latest_snapshot(later, ["id"], ("ts_ms", "seq")).collect()}
    assert new[1].a == "x1b" and new[1].b == "n1"


# ----------------------------------------- batch-ts manifest time travel
def test_changelog_asof_manifest_driven(spark, tmp_path):
    """Batch-dir pruning is metadata-first: manifest-listed batches
    prune by recorded range (proven by a coarse range that makes a
    dir visible where a data probe would exclude it), unlisted
    batches fall back to a probe scan of just their dirs."""
    from pyspark.sql import functions as F

    from ripcurrent_spark.cdc.apply import read_changelog_asof
    from ripcurrent_spark.sinks import record_batch_ts

    log = str(tmp_path / "log")
    b0 = spark.createDataFrame(
        [("c", 100, 1, 1, "x1"), ("c", 110, 2, 2, "x2")],
        "op string, ts_ms long, seq long, id long, a string",
    )
    b1 = spark.createDataFrame(
        [("u", 200, 3, 1, "x1b", "n1")],
        "op string, ts_ms long, seq long, id long, a string, b string",
    )
    b2 = spark.createDataFrame(
        [("c", 300, 4, 5, "x5")], "op string, ts_ms long, seq long, id long, a string"
    )
    for i, b in enumerate([b0, b1, b2]):
        b.withColumn("_batch_id", F.lit(i)).write.mode("append").partitionBy(
            "_batch_id"
        ).parquet(log)
    record_batch_ts(log, 0, 100, 110)
    record_batch_ts(log, 1, 200, 210)  # batch 2 left unlisted

    asof = read_changelog_asof(spark, log, 150)
    assert "b" not in asof.columns and asof.count() == 2

    # A coarse manifest range (merge widens 200 -> 120) makes batch
    # 1's DIR visible at cutoff 150 — schema gains `b` although no row
    # passes the ts filter. A data probe would have excluded the dir:
    # the decision is provably metadata-driven.
    record_batch_ts(log, 1, 120, 210)
    asof2 = read_changelog_asof(spark, log, 150)
    assert "b" in asof2.columns and asof2.count() == 2

    # Unlisted batch 2 resolves via the probe fallback.
    asof3 = read_changelog_asof(spark, log, 300)
    assert asof3.count() == 4


def test_compaction_folds_batch_manifest(spark, tmp_path):
    """Log compaction merges folded batches' manifest ranges into the
    compacted base entry, so metadata time travel keeps working."""
    from pyspark.sql import functions as F

    from ripcurrent_spark.sinks import (
        batch_ts_manifest,
        compact_log_batches,
        record_batch_ts,
    )

    log = tmp_path / "log"
    for i, ts in enumerate([100, 200, 300]):
        spark.createDataFrame([(ts, i)], "ts_ms long, v long").withColumn(
            "_batch_id", F.lit(i)
        ).write.mode("append").partitionBy("_batch_id").parquet(str(log))
        record_batch_ts(log, i, ts, ts + 10)
    folded = compact_log_batches(spark, str(log), keep_latest=1)
    assert folded == [0, 1]
    assert batch_ts_manifest(log) == {-1: (100, 210), 2: (300, 310)}


def test_compaction_crash_recovery_replays_manifest_fold(spark, tmp_path):
    """The review scenario: a crash AFTER the sealed stage exists but
    BEFORE the swap completes must replay the whole finish — including
    the batch-ts manifest fold — from the sealed stage on the next
    compaction call."""
    import json

    from pyspark.sql import functions as F

    from ripcurrent_spark.sinks import (
        batch_ts_manifest,
        compact_log_batches,
        record_batch_ts,
    )

    log = tmp_path / "log"
    for i, ts in enumerate([100, 200, 300]):
        spark.createDataFrame([(ts, i)], "ts_ms long, v long").withColumn(
            "_batch_id", F.lit(i)
        ).write.mode("append").partitionBy("_batch_id").parquet(str(log))
        record_batch_ts(log, i, ts, ts + 10)

    # Simulate the crash point: stage the folded base + sealed
    # manifest exactly as compact_log_batches would, then "crash"
    # (never run the finish).
    stage = tmp_path / "log.compact_stage"
    (
        spark.read.parquet(str(log))
        .filter(F.col("_batch_id").isin([0, 1]))
        .withColumn("_batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("_batch_id")
        .parquet(str(stage))
    )
    (stage / "_MANIFEST.json").write_text(
        json.dumps({"folded": [0, 1], "part_cols": ["_batch_id"]})
    )

    # Next compaction run recovers: swap + dir deletion + manifest fold.
    folded = compact_log_batches(spark, str(log), keep_latest=1)
    assert 0 in folded and 1 in folded
    assert batch_ts_manifest(log) == {-1: (100, 210), 2: (300, 310)}
    assert not (tmp_path / "log" / "_batch_id=0").exists()
    rows = {(r.ts_ms, r.v) for r in spark.read.parquet(str(log)).collect()}
    assert rows == {(100, 0), (200, 1), (300, 2)}
