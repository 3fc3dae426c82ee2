"""Incremental DSIR model maintenance over a document stream — the
third streaming twin (after incremental text/image dedup and
incremental connected components): keep the two bag-of-buckets
feature models (raw corpus + target slice) up to date per trigger so
importance weights are always computable WITHOUT re-scanning the
corpus, and new documents can be scored as they arrive.

Why this streams trivially where dedup needed real machinery: the
DSIR model state is two {DSIR_B}-row count vectors, and counts are
MERGEABLE — the model of a union is the sum of per-batch models (the
HLL-register discipline, but exact). So each trigger writes only its
own batch's 512-row partial aggregate under its ``_batch_id``
partition (dynamic partition overwrite = at-least-once replay safe:
a replayed batch overwrites its own partition, never double-counts),
and the current model is one {DSIR_B}-group sum over
batches x {DSIR_B} rows — independent of corpus size. Per-trigger
work: one batch-sized fused Arrow pass (operators/dsir.bucket_counts,
THE SAME implementation the batch query runs) + a 512-row write.

Equality law (pinned by tests/test_streaming_dsir.py): after any
sequence of triggers, ``dsir_model_snapshot`` equals the batch
models over the union of all streamed documents, and scoring the
corpus against the snapshot equals ``curation_dsir_weights`` run as
one batch — same buckets, same smoothing, same DECIMAL rounding,
because all three steps are the shared operators/dsir.py functions.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.operators import dsir as DS
from ripcurrent_spark.operators.dedup import tokens
from ripcurrent_spark.streaming.state import read_state

TARGET_LANG = "en"  # the in-repo proxy target slice (matches batch)


def streaming_dsir_foreach_batch(state_dir: str, target_lang: str = TARGET_LANG):
    """foreachBatch fn for a (doc_id, lang, text) document stream:
    per trigger, fold the batch's docs into (b, cr, ct) partial model
    counts and overwrite the batch's own ``_batch_id`` partition."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return  # nothing to fold; an empty dynamic overwrite would
            # land a data-file-free partition (ADVICE r10 #4)
        d = batch.select("doc_id", "lang", tokens("text").alias("toks"))
        db = DS.bucket_counts(d)
        partial = db.groupBy("b").agg(
            F.sum("c").alias("cr"),
            F.sum(F.when(F.col("lang") == target_lang, F.col("c"))).alias("ct"),
        )
        (
            partial.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(state_dir)
        )

    return _apply


_STATE_SCHEMA = "b long, cr long, ct long, _batch_id long"


def compact_dsir_state(spark, state_dir: str | Path, keep_latest: int = 1) -> list:
    """Sum-merge closed batch partials into the base: the state stays
    <= {DSIR_B} rows + keep_latest batch partials at any trigger
    count (streaming/state.compact_state; replay-safe). A null
    summed ct (no target docs ever) keeps the snapshot's
    null-filtered semantics."""
    from ripcurrent_spark.streaming.state import compact_state

    return compact_state(
        spark, state_dir, merge_key=("b",), sum_cols=("cr", "ct"),
        keep_latest=keep_latest,
    )


def dsir_model_snapshot(spark, state_dir: str | Path) -> DataFrame:
    """(b, w): the current log-weight model — one {DSIR_B}-group sum
    over the per-batch partials, then the shared smoothing/log/DECIMAL
    fold. Equal to the batch models over all streamed docs. Reads the
    state with its fixed explicit schema, so an empty or not-yet-
    created state dir yields the empty model instead of a schema-
    inference error (ADVICE r10 #4)."""
    st = read_state(spark, state_dir, _STATE_SCHEMA)
    raw = st.groupBy("b").agg(F.sum("cr").alias("cr"))
    tgt = (
        st.filter(F.col("ct").isNotNull())
        .groupBy("b")
        .agg(F.sum("ct").alias("ct"))
    )
    return DS.log_weight_model(raw, tgt)


def dsir_score_docs(docs: DataFrame, lw: DataFrame) -> DataFrame:
    """Score a document frame (doc_id, lang, text) against a model
    frame (b, w) — the inference path a curation stream runs on NEW
    docs with the CURRENT snapshot (same output schema as the batch
    curation_dsir_weights)."""
    d = docs.select("doc_id", "lang", tokens("text").alias("toks"))
    return DS.score_counts(DS.bucket_counts(d), lw)
