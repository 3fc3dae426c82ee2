"""Incremental word-frequency table: streamed per-batch partials must
fold to the batch word-count collapse exactly, replay idempotently,
and feed bpe_train to the SAME merge table the batch trainer
produces (tokenizer retraining without a corpus rescan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.operators.dedup import tokens
from ripcurrent_spark.streaming.wordfreq import (
    streaming_word_counts_foreach_batch,
    word_counts_snapshot,
)
from tests.conftest import SF_ORACLE


def _docs(spark):
    from ripcurrent_spark.io import load

    return load(spark, SF_ORACLE, "documents").select("doc_id", "text")


def _batch_counts(spark):
    return {
        (r["word"], r["n"])
        for r in _docs(spark)
        .select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }


def test_streamed_word_counts_equal_batch(spark, tmp_path):
    state = str(tmp_path / "state")
    fn = streaming_word_counts_foreach_batch(state)
    docs = _docs(spark)
    for i in range(3):
        fn(docs.filter(F.col("doc_id") % 3 == i), i)
    got = {
        (r["word"], r["n"]) for r in word_counts_snapshot(spark, state).collect()
    }
    assert got == _batch_counts(spark)


def test_streaming_word_counts_replay_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    fn = streaming_word_counts_foreach_batch(state)
    docs = _docs(spark)
    fn(docs.filter(F.col("doc_id") % 2 == 0), 0)
    fn(docs.filter(F.col("doc_id") % 2 == 1), 1)
    before = sorted(
        (r["word"], r["n"]) for r in word_counts_snapshot(spark, state).collect()
    )
    fn(docs.filter(F.col("doc_id") % 2 == 1), 1)  # replay
    after = sorted(
        (r["word"], r["n"]) for r in word_counts_snapshot(spark, state).collect()
    )
    assert before == after


def test_bpe_train_over_streamed_snapshot_equals_batch(spark, tmp_path):
    """The point of the twin: retrain the tokenizer from the streamed
    word table and get the batch trainer's exact merge sequence."""
    from ripcurrent_spark.operators.text import bpe_train

    state = str(tmp_path / "state")
    fn = streaming_word_counts_foreach_batch(state)
    docs = _docs(spark)
    for i in range(3):
        fn(docs.filter(F.col("doc_id") % 3 == i), i)

    batch_words = (
        _docs(spark)
        .select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = bpe_train(batch_words, 4)
    cachereg.release_tracked()
    got = bpe_train(word_counts_snapshot(spark, state), 4)
    cachereg.release_tracked()
    assert got == want and len(got) == 4
