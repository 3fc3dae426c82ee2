"""Incremental char-bigram LM maintenance (the sixth streaming twin):
streamed per-batch count partials must fold to EXACTLY the batch
model (counts are mergeable), scoring against the snapshot must equal
text_charlm_score run as one batch, bucketizing those scores must
equal text_ppl_buckets, and replays must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.streaming.charlm import (
    charlm_model_snapshot,
    charlm_score_docs,
    streaming_charlm_foreach_batch,
)
from tests.conftest import SF_ORACLE


def _docs(spark):
    from ripcurrent_spark.io import load

    return load(spark, SF_ORACLE, "documents").select("doc_id", "text")


def _stream_in_triggers(spark, state, n=3):
    fn = streaming_charlm_foreach_batch(state)
    docs = _docs(spark)
    for i in range(n):
        fn(docs.filter(F.col("doc_id") % n == i), i)
    return docs


def test_streamed_model_scores_equal_batch(spark, tmp_path):
    """Stream the documents table in 3 id-sliced triggers; the model
    snapshot, applied to the full corpus, must reproduce the batch
    query's scores EXACTLY (same nanounit math end to end)."""
    from ripcurrent_spark.queries.text import text_charlm_score

    state = str(tmp_path / "state")
    docs = _stream_in_triggers(spark, state)
    lm = charlm_model_snapshot(spark, state)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in charlm_score_docs(docs, lm).collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in text_charlm_score(spark, SF_ORACLE).collect()
    }
    assert got == want


def test_streamed_ppl_buckets_equal_batch(spark, tmp_path):
    """The VERDICT r10 item-4 'done' criterion: text_ppl_buckets
    scoring over the streamed snapshot equals the batch run — shared
    bucketize over shared scores."""
    from ripcurrent_spark.operators.charlm import ppl_bucketize
    from ripcurrent_spark.queries.text import text_ppl_buckets

    state = str(tmp_path / "state")
    docs = _stream_in_triggers(spark, state)
    lm = charlm_model_snapshot(spark, state)
    got = sorted(
        (r["doc_id"], r["bucket"], r["t_lo"], r["t_hi"])
        for r in ppl_bucketize(charlm_score_docs(docs, lm)).collect()
    )
    want = sorted(
        (r["doc_id"], r["bucket"], r["t_lo"], r["t_hi"])
        for r in text_ppl_buckets(spark, SF_ORACLE).collect()
    )
    assert got == want


def test_streaming_charlm_replay_idempotent(spark, tmp_path):
    """At-least-once replay of the last trigger overwrites its own
    partition — the snapshot must not double-count."""
    state = str(tmp_path / "state")
    fn = streaming_charlm_foreach_batch(state)
    docs = _docs(spark)
    fn(docs.filter(F.col("doc_id") % 3 == 0), 0)
    fn(docs.filter(F.col("doc_id") % 3 == 1), 1)
    before = sorted(
        (r["b"], str(r["lnp"]))
        for r in charlm_model_snapshot(spark, state).collect()
    )
    fn(docs.filter(F.col("doc_id") % 3 == 1), 1)  # replay
    after = sorted(
        (r["b"], str(r["lnp"]))
        for r in charlm_model_snapshot(spark, state).collect()
    )
    assert before == after


def test_snapshot_is_model_sized(spark, tmp_path):
    """The snapshot plan touches only the <= 1369-row-per-batch state
    — never the document corpus (no mapInPandas, no corpus scan)."""
    state = str(tmp_path / "state")
    fn = streaming_charlm_foreach_batch(state)
    fn(_docs(spark).limit(50), 0)
    plan = (
        charlm_model_snapshot(spark, state)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan
    assert "documents" not in plan


def test_empty_and_missing_state_snapshots(spark, tmp_path):
    """Born with the ADVICE r10 #4 discipline: missing dir and empty
    first trigger both read as the empty model."""
    state = str(tmp_path / "state")
    assert charlm_model_snapshot(spark, state).count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    streaming_charlm_foreach_batch(state)(empty, 0)
    assert charlm_model_snapshot(spark, state).count() == 0
