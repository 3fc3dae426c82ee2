"""Incremental char-bigram LM maintenance over a document stream —
the sixth streaming twin (text/image dedup, connected components,
DSIR models, word frequencies, now the perplexity model behind
text_charlm_score / text_ppl_buckets; VERDICT r10 item 4).

Why this streams trivially: the model state is ONE bounded
bigram-count table (<= 1369 rows — the 37-symbol normalized alphabet
squared, corpus-size-independent) and counts are mergeable, so the
DSIR pattern applies verbatim: each trigger writes only its own
batch's count partials under its ``_batch_id`` partition (dynamic
partition overwrite = at-least-once replay overwrites its own
partition, never double-counts), and the current model is one
fixed-size sum + the shared smoothing/log/DECIMAL training fold.
Per-trigger work: one batch-sized map-only Arrow histogram pass
(operators/charlm.bigram_counts — THE SAME implementation the batch
query runs) + a <= 1369-row write.

Equality laws (tests/test_streaming_charlm.py): after any sequence of
triggers, ``charlm_model_snapshot`` equals the batch model over the
union of all streamed documents; scoring the corpus against the
snapshot equals ``text_charlm_score`` run as one batch; and
``ppl_bucketize`` over those scores equals ``text_ppl_buckets`` —
same counts, same smoothing, same DECIMAL rounding, same thresholds,
because every step is the shared operators/charlm.py functions.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.operators import charlm as LM
from ripcurrent_spark.operators.dedup import norm_text
from ripcurrent_spark.streaming.state import read_state

_STATE_SCHEMA = "b string, c long, _batch_id long"


def compact_charlm_state(spark, state_dir: str | Path, keep_latest: int = 1) -> list:
    """Sum-merge closed batch partials into the base: the state stays
    <= 1369 rows + keep_latest batch partials at any trigger count
    (streaming/state.compact_state; replay-safe)."""
    from ripcurrent_spark.streaming.state import compact_state

    return compact_state(
        spark, state_dir, merge_key=("b",), sum_cols=("c",),
        keep_latest=keep_latest,
    )


def _normed(batch: DataFrame) -> DataFrame:
    """The batch query's exact normalization gate (doc_id, t)."""
    return batch.select("doc_id", norm_text("text").alias("t")).filter(
        F.length("t") >= 2
    )


def streaming_charlm_foreach_batch(state_dir: str):
    """foreachBatch fn for a (doc_id, text) document stream: fold the
    batch's docs into (b, c) bigram-count partials and overwrite the
    batch's own ``_batch_id`` partition."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return  # an empty dynamic overwrite would land a
            # data-file-free partition (ADVICE r10 #4)
        partial = (
            LM.bigram_partials(_normed(batch))
            .groupBy("b")
            .agg(F.sum("c").alias("c"))
        )
        (
            partial.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(state_dir)
        )

    return _apply


def charlm_counts_snapshot(spark, state_dir: str | Path) -> DataFrame:
    """(b, cb): the current corpus bigram-count table — one bounded
    sum over the per-batch partials. Equal to
    operators/charlm.bigram_counts over all streamed docs. Explicit-
    schema read: an empty or not-yet-created state dir yields the
    empty table, not an inference error (ADVICE r10 #4)."""
    st = read_state(spark, state_dir, _STATE_SCHEMA)
    return st.groupBy("b").agg(F.sum("c").alias("cb"))


def charlm_model_snapshot(spark, state_dir: str | Path) -> DataFrame:
    """(b, lnp): the current trained model — the shared smoothing/
    log/DECIMAL fold over the streamed counts."""
    return LM.lm_from_counts(charlm_counts_snapshot(spark, state_dir))


def charlm_score_docs(docs: DataFrame, lm: DataFrame) -> DataFrame:
    """Score a (doc_id, text) document frame against a model snapshot
    — the inference path a curation stream runs on NEW docs with the
    CURRENT model (same output schema as text_charlm_score)."""
    return LM.score_with_lm(_normed(docs), lm)
