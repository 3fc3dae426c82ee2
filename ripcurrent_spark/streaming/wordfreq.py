"""Incremental word-frequency maintenance over a document stream —
the fourth streaming twin (text/image dedup, connected components,
DSIR models, now the corpus word table): the (word, count) collapse
is the corpus-sized step in front of the BPE trainer
(queries/text.text_bpe_train) and every vocabulary audit, so keeping
it incrementally means a tokenizer can be (re)trained at any moment
WITHOUT rescanning the corpus.

Counts are mergeable, so the machinery is the DSIR-model pattern:
each trigger writes its batch's per-word partial counts under its own
``_batch_id`` partition (dynamic partition overwrite — an
at-least-once replay overwrites its own partition, never
double-counts), partitioned additionally by a word-hash ``_bucket``
so the snapshot fold and any word-keyed probe prune partitions. The
snapshot is one word-keyed sum whose input is (batches x words-seen-
in-batch) rows — vocabulary-scaled by Heaps' law, never
corpus-scaled, and the per-trigger cost is one batch-sized tokenize +
partial-agg.

Equality laws (tests/test_streaming_wordfreq.py): the snapshot equals
the batch word-count collapse over the union of all streamed docs,
replays are idempotent, and bpe_train over the streamed snapshot
returns EXACTLY the merge table the batch trainer produces — the
tokenizer-retraining-without-rescan story, end to end.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.operators.dedup import tokens
from ripcurrent_spark.sinks import key_bucket
from ripcurrent_spark.streaming.state import read_state

_STATE_SCHEMA = "word string, n long, _bucket int, _batch_id long"


def compact_word_counts_state(
    spark, state_dir: str | Path, keep_latest: int = 1
) -> list:
    """Sum-merge closed batch partials into the base: the state stays
    vocabulary-sized + keep_latest batch partials at any trigger
    count (streaming/state.compact_state; replay-safe; _bucket rides
    in the merge key because it partitions the nested layout)."""
    from ripcurrent_spark.streaming.state import compact_state

    return compact_state(
        spark, state_dir, merge_key=("word", "_bucket"), sum_cols=("n",),
        keep_latest=keep_latest,
    )


def streaming_word_counts_foreach_batch(state_dir: str, n_buckets: int = 16):
    """foreachBatch fn for a (doc_id, text) document stream: fold the
    batch into per-word partial counts under its own partition."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return  # an empty dynamic overwrite would land a
            # data-file-free partition (ADVICE r10 #4)
        w = (
            batch.select(F.explode(tokens("text")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        (
            w.withColumn("_bucket", key_bucket(["word"], n_buckets))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket", "_batch_id")
            .parquet(state_dir)
        )

    return _apply


def word_counts_snapshot(spark, state_dir: str | Path) -> DataFrame:
    """(word, n) for every word ever streamed — one word-keyed sum
    over the per-batch partials (vocabulary-scaled input). Equal to
    the batch collapse over the union of all streamed documents.
    Explicit-schema read: an empty or not-yet-created state dir
    yields the empty table, not an inference error (ADVICE r10 #4)."""
    st = read_state(spark, state_dir, _STATE_SCHEMA)
    return st.groupBy("word").agg(F.sum("n").cast("long").alias("n"))
