"""Incremental DSIR model maintenance: streamed per-batch partial
counts must fold to EXACTLY the batch models (counts are mergeable),
scoring against the snapshot must equal curation_dsir_weights run as
one batch, and replays must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.streaming.dsir import (
    dsir_model_snapshot,
    dsir_score_docs,
    streaming_dsir_foreach_batch,
)
from tests.conftest import SF_ORACLE


def _docs(spark):
    from ripcurrent_spark.io import load

    return load(spark, SF_ORACLE, "documents").select("doc_id", "lang", "text")


def _batch_weights(spark):
    from ripcurrent_spark.queries.curation import curation_dsir_weights

    rows = {
        r["doc_id"]: (r["n_grams"], r["log_weight"], r["target_like"])
        for r in curation_dsir_weights(spark, SF_ORACLE).collect()
    }
    cachereg.release_tracked()
    return rows


def test_streamed_model_scores_equal_batch(spark, tmp_path):
    """Stream the documents table in 3 id-sliced triggers; the model
    snapshot, applied to the full corpus, must reproduce the batch
    query's weights EXACTLY (same DECIMAL math end to end)."""
    state = str(tmp_path / "state")
    fn = streaming_dsir_foreach_batch(state)
    docs = _docs(spark)
    for i in range(3):
        fn(docs.filter(F.col("doc_id") % 3 == i), i)

    lw = dsir_model_snapshot(spark, state)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"], r["target_like"])
        for r in dsir_score_docs(docs, lw).collect()
    }
    assert got == _batch_weights(spark)


def test_streaming_dsir_replay_idempotent(spark, tmp_path):
    """At-least-once replay of the last trigger overwrites its own
    partition — the snapshot must not double-count."""
    state = str(tmp_path / "state")
    fn = streaming_dsir_foreach_batch(state)
    docs = _docs(spark)
    fn(docs.filter(F.col("doc_id") % 3 == 0), 0)
    fn(docs.filter(F.col("doc_id") % 3 == 1), 1)
    before = sorted(
        (r["b"], str(r["w"])) for r in dsir_model_snapshot(spark, state).collect()
    )
    fn(docs.filter(F.col("doc_id") % 3 == 1), 1)  # replay
    after = sorted(
        (r["b"], str(r["w"])) for r in dsir_model_snapshot(spark, state).collect()
    )
    assert before == after


def test_snapshot_is_model_sized(spark, tmp_path):
    """The snapshot plan touches only the 512-row-per-batch state —
    never the document corpus (no mapInPandas, no corpus scan)."""
    state = str(tmp_path / "state")
    fn = streaming_dsir_foreach_batch(state)
    fn(_docs(spark).limit(50), 0)
    plan = (
        dsir_model_snapshot(spark, state)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan
    assert "documents" not in plan
