"""Incremental connected components over an edge stream: the
persistent node->component map must equal batch connected_components
over the union of all streamed edges, survive cross-batch merges of
previously-separate components, and replay idempotently."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.operators.dedup import connected_components
from ripcurrent_spark.streaming.components import (
    components_snapshot,
    streaming_components_foreach_batch,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _batch_truth(spark, all_pairs):
    out = {
        (r["node"], r["component"])
        for r in connected_components(_edges(spark, all_pairs)).collect()
    }
    cachereg.release_tracked()
    return out


def test_streaming_components_match_batch(spark, tmp_path):
    """Three triggers whose edges merge ACROSS batches (batch 2 joins
    two components born in different earlier batches); the snapshot
    after each trigger equals batch CC over the union so far."""
    state, remap = str(tmp_path / "state"), str(tmp_path / "remap")
    fn = streaming_components_foreach_batch(state, remap)
    batches = [
        [(1, 2), (10, 11), (20, 21)],
        [(2, 3), (11, 12), (30, 31)],
        [(3, 10), (21, 30)],  # merges {1,2,3}+{10,11,12} and {20,21}+{30,31}
    ]
    seen = []
    for i, b in enumerate(batches):
        seen += b
        fn(_edges(spark, b), i)
        got = {
            (r["node"], r["component"])
            for r in components_snapshot(spark, state, remap).collect()
        }
        assert got == _batch_truth(spark, seen), f"diverged after batch {i}"


def test_foreach_batch_spares_foreign_tracked_handles(spark, tmp_path):
    """ADVICE r9 (medium): a streaming trigger's internal release must
    not drain cachereg handles owned by concurrent BATCH consumers —
    for checkpoint-backed handles that is permanent breakage, not a
    cache miss. Plant a persisted tracked frame, run a merge-bearing
    trigger, and require the foreign frame still cached and the
    trigger's own handles gone."""
    foreign = cachereg.track(
        spark.createDataFrame([(1,)], "x long").persist()
    )
    foreign.count()  # materialize the cache
    try:
        state, remap = str(tmp_path / "state"), str(tmp_path / "remap")
        fn = streaming_components_foreach_batch(state, remap)
        fn(_edges(spark, [(1, 2), (2, 3)]), 0)  # runs connected_components
        assert foreign.storageLevel.useMemory, "foreign cache was drained"
        assert cachereg.tracked_frames() == [foreign], "trigger leaked/ate handles"
    finally:
        cachereg.release_tracked()


def test_streaming_components_replay_idempotent(spark, tmp_path):
    state, remap = str(tmp_path / "state"), str(tmp_path / "remap")
    fn = streaming_components_foreach_batch(state, remap)
    fn(_edges(spark, [(1, 2), (10, 11)]), 0)
    fn(_edges(spark, [(2, 10)]), 1)
    before = sorted(
        (r["node"], r["component"])
        for r in components_snapshot(spark, state, remap).collect()
    )
    fn(_edges(spark, [(2, 10)]), 1)  # at-least-once replay of batch 1
    after = sorted(
        (r["node"], r["component"])
        for r in components_snapshot(spark, state, remap).collect()
    )
    assert after == before
    # One state row per node (rows are written once, never duplicated).
    st = spark.read.parquet(state)
    assert st.count() == st.select("node").distinct().count()


def test_components_state_compaction(spark, tmp_path):
    """Folding the node state and purging old remap snapshots must
    preserve the snapshot exactly, keep replay of the newest batch
    idempotent, and bound partition counts."""
    from pathlib import Path

    from ripcurrent_spark.streaming.components import compact_components_state

    state, remap = str(tmp_path / "state"), str(tmp_path / "remap")
    fn = streaming_components_foreach_batch(state, remap)
    batches = [[(1, 2), (10, 11)], [(2, 10)], [(20, 21)]]
    seen = []
    for i, b in enumerate(batches):
        seen += b
        fn(_edges(spark, b), i)
    before = sorted(
        (r["node"], r["component"])
        for r in components_snapshot(spark, state, remap).collect()
    )

    out = compact_components_state(spark, state, remap)
    assert out["state"], "no state batches folded"
    assert out["remap_purged"] == [0]  # newest two snapshots kept
    remap_ids = {d.name for d in Path(remap).glob("_batch_id=*")}
    assert remap_ids == {"_batch_id=1", "_batch_id=2"}

    after = sorted(
        (r["node"], r["component"])
        for r in components_snapshot(spark, state, remap).collect()
    )
    assert after == before
    # Replay of the newest batch against compacted state: idempotent.
    fn(_edges(spark, batches[-1]), 2)
    assert sorted(
        (r["node"], r["component"])
        for r in components_snapshot(spark, state, remap).collect()
    ) == before
    # New batch merging across the compacted base still works.
    fn(_edges(spark, [(11, 20)]), 3)
    got = {
        (r["node"], r["component"])
        for r in components_snapshot(spark, state, remap).collect()
    }
    assert got == _batch_truth(spark, seen + [(11, 20)])


def test_snapshot_plan_has_no_iteration(spark, tmp_path):
    """The consumer view must be ONE join — no propagation loop, no
    checkpoint barrier in the read path."""
    state, remap = str(tmp_path / "state"), str(tmp_path / "remap")
    fn = streaming_components_foreach_batch(state, remap)
    fn(_edges(spark, [(1, 2), (2, 3)]), 0)
    snap = components_snapshot(spark, state, remap)
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 2  # state⋈remap (+ AQE wrapper at most)
    got = {(r["node"], r["component"]) for r in snap.collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}
