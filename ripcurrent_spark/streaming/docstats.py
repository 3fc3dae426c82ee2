"""Incremental BM25 corpus statistics over a document stream — the
seventh streaming twin (text/image dedup, connected components, DSIR
models, word frequencies, charlm, now the retrieval statistics behind
text_bm25_search): keep the document-frequency table and the
(n_docs, sum_dl) totals up to date per trigger so BM25 can score ANY
query against the current corpus WITHOUT a rescan.

Why this streams trivially: df(term) = number of docs containing the
term, and triggers partition the corpus into disjoint doc sets, so
per-batch df partials SUM exactly; n_docs and sum_dl are plain
mergeable counts. The state is the DSIR/wordfreq shape twice over:

- ``<state>/df``    — (term, df) partials, partitioned by a term-hash
  ``_bucket`` (word-keyed probes prune partitions) and ``_batch_id``
  (dynamic overwrite = at-least-once replay overwrites its own
  partition, never double-counts). Vocabulary-scaled by Heaps' law.
- ``<state>/totals`` — one (n_docs, sum_dl) row per batch, counting
  EVERY doc (zero-token docs carry dl=0 and no df rows — exactly the
  batch aggregate's behavior).

Equality laws (tests/test_streaming_docstats.py): the stats snapshot
assembled for a query equals the batch ``corpus_stats`` row over the
union of all streamed docs, and ``bm25_topk`` against the snapshot
equals ``text_bm25_search`` run as one batch — same counts, same
fixed-order scoring fold, because counting/stats/scoring are the
shared operators/retrieval.py functions.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.operators.dedup import tokens
from ripcurrent_spark.sinks import key_bucket
from ripcurrent_spark.streaming.state import read_state

_DF_SCHEMA = "term string, df long, _bucket int, _batch_id long"
_TOTALS_SCHEMA = "n_docs long, sum_dl long, _batch_id long"


def streaming_doc_stats_foreach_batch(state_dir: str, n_buckets: int = 16):
    """foreachBatch fn for a (doc_id, text) document stream: land the
    batch's df partials and totals row under its own partition."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return  # an empty dynamic overwrite would land a
            # data-file-free partition (ADVICE r10 #4)
        toks = batch.select("doc_id", tokens("text").alias("toks"))
        df_part = (
            toks.select("doc_id", F.explode("toks").alias("term"))
            .filter(F.col("term") != "")
            .distinct()  # df counts DOCS, not occurrences
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        (
            df_part.withColumn("_bucket", key_bucket(["term"], n_buckets))
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket", "_batch_id")
            .parquet(str(Path(state_dir) / "df"))
        )
        totals = toks.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.size("toks"), F.lit(0))).alias("sum_dl"),
        )
        (
            totals.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(str(Path(state_dir) / "totals"))
        )

    return _apply


def compact_doc_stats_state(
    spark, state_dir: str | Path, keep_latest: int = 1
) -> dict[str, list]:
    """Sum-merge both state tables' closed batch partials into their
    bases: df stays vocabulary-sized and totals stays ONE row (+
    keep_latest batch partials each) at any trigger count
    (streaming/state.compact_state; replay-safe)."""
    from ripcurrent_spark.streaming.state import compact_state

    return {
        "df": compact_state(
            spark, Path(state_dir) / "df", merge_key=("term", "_bucket"),
            sum_cols=("df",), keep_latest=keep_latest,
        ),
        "totals": compact_state(
            spark, Path(state_dir) / "totals", merge_key=(),
            sum_cols=("n_docs", "sum_dl"), keep_latest=keep_latest,
        ),
    }


def df_snapshot(spark, state_dir: str | Path) -> DataFrame:
    """(term, df) for every term ever streamed — one term-keyed sum
    over the per-batch partials (vocabulary-scaled input).
    Explicit-schema read: empty/missing state yields the empty table
    (ADVICE r10 #4 discipline)."""
    st = read_state(spark, Path(state_dir) / "df", _DF_SCHEMA)
    return st.groupBy("term").agg(F.sum("df").alias("df"))


def totals_snapshot(spark, state_dir: str | Path) -> DataFrame:
    """1-row (n_docs, sum_dl) over every streamed doc."""
    st = read_state(spark, Path(state_dir) / "totals", _TOTALS_SCHEMA)
    return st.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
    )


def stats_for_terms(
    spark, state_dir: str | Path, terms: tuple[str, ...], n_buckets: int = 16
) -> DataFrame:
    """The 1-row (n, df0..df{k-1}, sumdl) BM25 stats frame for a query
    — the shape operators/retrieval.corpus_stats produces, assembled
    from the snapshots: k tiny df lookups + the totals row. Each
    lookup carries BOTH the term predicate and the term's literal
    ``_bucket`` value (constant-folded from the same key_bucket
    expression the writer used; ``n_buckets`` must match the
    writer's), so the scan prunes to one bucket's partitions instead
    of reading the whole vocabulary state — a term filter alone
    cannot prune a hash-bucketed layout. Terms never streamed get
    df=0, exactly as the batch aggregate counts them."""
    st = read_state(spark, Path(state_dir) / "df", _DF_SCHEMA)
    looked = []
    for i, t in enumerate(terms):
        # The writer's exact bucket expression over the literal term —
        # constant-folded, so the _bucket predicate prunes partitions.
        bucket = F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets)).cast("int")
        looked.append(
            st.filter((F.col("_bucket") == bucket) & (F.col("term") == t)).agg(
                F.coalesce(F.sum("df"), F.lit(0)).alias(f"df{i}")
            )
        )
    out = totals_snapshot(spark, state_dir).select(
        F.col("n_docs").alias("n"), F.col("sum_dl").alias("sumdl")
    )
    for frame in looked:
        out = out.crossJoin(F.broadcast(frame))
    return out.select(
        "n", *[f"df{i}" for i in range(len(terms))], "sumdl"
    )


def tfidf_topk_docs(
    docs: DataFrame, spark, state_dir: str | Path, k: int = 3
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF against the STREAMED
    corpus statistics — the keyword-extraction consumer of this
    twin's state (same formula, ranking, and output schema as the
    batch text_tfidf_topk: idf = ln((N+1)/(df+1)), row_number by
    (tfidf desc, term)). tf comes from the docs being scored (one
    explode + groupBy); df and N come from the snapshots, so scoring
    new docs needs NO corpus rescan. A term never streamed scores
    with df=0 (idf = ln(N+1)) — on the streamed corpus itself every
    term has df >= 1 and the output equals the batch query exactly."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = df_snapshot(spark, state_dir)
    n = totals_snapshot(spark, state_dir).collect()[0]["n_docs"]
    scored = tf.join(F.broadcast(df), "term", "left").select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.coalesce("df", F.lit(0)).cast("long").alias("df"),
        F.round(
            F.col("tf")
            * F.log(
                (F.lit(float(n)) + 1.0) / (F.coalesce("df", F.lit(0)) + 1.0)
            ),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


def bm25_score_docs(docs: DataFrame, stats: DataFrame, terms: tuple[str, ...], k: int = 100) -> DataFrame:
    """Score a (doc_id, text) frame against a streamed stats snapshot
    — the inference path a search deployment runs with the CURRENT
    corpus statistics (same output schema as text_bm25_search)."""
    from ripcurrent_spark.operators import retrieval as RT

    t = RT.term_counts(docs.select("doc_id", tokens("text").alias("toks")), terms)
    return RT.bm25_topk(t, stats, len(terms), k=k)
