"""Incremental BM25 corpus statistics (the seventh streaming twin):
streamed per-batch df/totals partials must assemble to EXACTLY the
batch stats row (disjoint doc sets make df partials sum exactly),
scoring against the snapshot must equal text_bm25_search run as one
batch, and replays must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.streaming.docstats import (
    bm25_score_docs,
    df_snapshot,
    stats_for_terms,
    streaming_doc_stats_foreach_batch,
    totals_snapshot,
)
from tests.conftest import SF_ORACLE

TERMS = ("spark", "join", "stream")


def _docs(spark):
    from ripcurrent_spark.io import load

    return load(spark, SF_ORACLE, "documents").select("doc_id", "text")


def _stream_in_triggers(spark, state, n=3):
    fn = streaming_doc_stats_foreach_batch(state)
    docs = _docs(spark)
    for i in range(n):
        fn(docs.filter(F.col("doc_id") % n == i), i)
    return docs


def test_streamed_stats_equal_batch_stats(spark, tmp_path):
    """The assembled (n, df0..df2, sumdl) row equals the batch
    corpus_stats over the same corpus — exact integer equality."""
    from ripcurrent_spark.operators.dedup import tokens
    from ripcurrent_spark.operators.retrieval import corpus_stats, term_counts

    state = str(tmp_path / "state")
    docs = _stream_in_triggers(spark, state)
    got = stats_for_terms(spark, state, TERMS).collect()[0].asDict()
    t = term_counts(docs.select("doc_id", tokens("text").alias("toks")), TERMS)
    want = corpus_stats(t, len(TERMS)).collect()[0].asDict()
    assert got == want


def test_streamed_stats_scores_equal_batch(spark, tmp_path):
    """bm25_topk against the streamed snapshot equals text_bm25_search
    run as one batch — same counts, same fixed-order scoring fold."""
    from ripcurrent_spark.queries.search import text_bm25_search

    state = str(tmp_path / "state")
    docs = _stream_in_triggers(spark, state)
    stats = stats_for_terms(spark, state, TERMS)
    got = [tuple(r) for r in bm25_score_docs(docs, stats, TERMS).collect()]
    want = [tuple(r) for r in text_bm25_search(spark, SF_ORACLE).collect()]
    assert got == want


def test_streamed_tfidf_equals_batch(spark, tmp_path):
    """The keyword-extraction consumer: TF-IDF top-3 against the
    streamed df/totals equals text_tfidf_topk run as one batch (every
    term of the streamed corpus has df >= 1, so the left-join df path
    is exactly the batch inner join)."""
    from ripcurrent_spark.queries.search import text_tfidf_topk
    from ripcurrent_spark.streaming.docstats import tfidf_topk_docs

    state = str(tmp_path / "state")
    docs = _stream_in_triggers(spark, state)
    got = [tuple(r) for r in tfidf_topk_docs(docs, spark, state).collect()]
    want = [tuple(r) for r in text_tfidf_topk(spark, SF_ORACLE).collect()]
    assert got == want


def test_streaming_docstats_replay_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    fn = streaming_doc_stats_foreach_batch(state)
    docs = _docs(spark)
    fn(docs.filter(F.col("doc_id") % 3 == 0), 0)
    fn(docs.filter(F.col("doc_id") % 3 == 1), 1)
    before = stats_for_terms(spark, state, TERMS).collect()
    fn(docs.filter(F.col("doc_id") % 3 == 1), 1)  # replay
    after = stats_for_terms(spark, state, TERMS).collect()
    assert before == after


def test_snapshot_is_state_sized(spark, tmp_path):
    """The snapshot plans touch only the state dirs — never the
    document corpus (no mapInPandas, no documents scan)."""
    state = str(tmp_path / "state")
    streaming_doc_stats_foreach_batch(state)(_docs(spark).limit(50), 0)
    for frame in (
        df_snapshot(spark, state),
        totals_snapshot(spark, state),
        stats_for_terms(spark, state, TERMS),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        assert "documents" not in plan


def test_df_lookup_prunes_bucket_partitions(spark, tmp_path):
    """Each term lookup must carry the writer's literal _bucket value
    so the scan prunes to one bucket's partitions — a term filter
    alone cannot prune a hash-bucketed layout."""
    import re

    state = str(tmp_path / "state")
    streaming_doc_stats_foreach_batch(state)(_docs(spark).limit(50), 0)
    plan = (
        stats_for_terms(spark, state, ("spark",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("_bucket" in pf and "=" in pf for pf in pfs), plan[:2000]


def test_empty_and_missing_state(spark, tmp_path):
    """Born with the ADVICE r10 #4 discipline: missing dir and empty
    first trigger both read as empty stats (n=0, df=0, sumdl=0)."""
    state = str(tmp_path / "state")
    row = stats_for_terms(spark, state, TERMS).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    streaming_doc_stats_foreach_batch(state)(empty, 0)
    row = stats_for_terms(spark, state, TERMS).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0)
