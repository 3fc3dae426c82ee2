"""Streaming incremental dedup: new docs are admitted or flagged
duplicate against the persistent LSH index across micro-batches, and
a replayed batch neither duplicates the index nor matches docs
against their own earlier write."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from ripcurrent_spark.streaming.dedup import (
    index_size,
    streaming_dedup_foreach_batch,
)

A = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
A_NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden nearby"
)
B = (
    "completely different content about databases indexes and query "
    "planning with hash joins broadcast joins and shuffle partitions"
)
C = (
    "a third unrelated document discussing sailing boats harbors tides "
    "and the weather patterns of the northern atlantic ocean in winter"
)


def _write_batch(d, name, docs, mtime):
    d.mkdir(parents=True, exist_ok=True)
    p = d / name
    with open(p, "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(p, (mtime, mtime))  # file-source orders batches by mtime


def _start(spark, src, tmp_path, index, decisions):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return (
        stream.writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(streaming_dedup_foreach_batch(str(index), str(decisions)))
        .start()
    )


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "docs"
    index = tmp_path / "index"
    decisions = tmp_path / "decisions"
    t0 = time.time()
    _write_batch(src, "b0.json", [(1, A), (2, B)], t0)

    q = _start(spark, src, tmp_path, index, decisions)
    q.processAllAvailable()
    # batch 2: near-copy of an INDEXED doc + a fresh one + an in-batch
    # near-copy pair (5 before 4 checks lowest-id-wins)
    _write_batch(src, "b1.json", [(3, A_NEAR), (4, C), (5, C)], t0 + 2)
    q.processAllAvailable()
    q.stop()

    dec = {
        r.doc_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(str(decisions)).collect()
    }
    assert dec[1] == (False, None)
    assert dec[2] == (False, None)
    assert dec[3] == (True, 1)  # matched the admitted doc from batch 0
    assert dec[4] == (False, None)
    assert dec[5] == (True, 4)  # in-batch pair: lower id admitted
    # Only admitted docs are in the index.
    assert index_size(spark, index) == 3
    idx_docs = {
        r.doc_id
        for r in spark.read.parquet(str(index)).select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 2, 4}


def test_streaming_dedup_replay_idempotent(spark, tmp_path):
    """Re-running a batch (at-least-once foreachBatch) must leave the
    index and decisions unchanged: partitions overwrite in place and
    the index read excludes the batch's own rows."""
    src = tmp_path / "docs"
    index = tmp_path / "index"
    decisions = tmp_path / "decisions"
    t0 = time.time()
    _write_batch(src, "b0.json", [(1, A), (2, B)], t0)
    q = _start(spark, src, tmp_path, index, decisions)
    q.processAllAvailable()
    q.stop()

    fn = streaming_dedup_foreach_batch(str(index), str(decisions))
    batch = spark.createDataFrame([(1, A), (2, B)], "doc_id long, text string")
    fn(batch, 0)  # manual replay of batch 0

    dec = {
        r.doc_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(str(decisions)).collect()
    }
    # Not flagged duplicate against their own earlier index rows.
    assert dec == {1: (False, None), 2: (False, None)}
    assert index_size(spark, index) == 2
    # One index row per (admitted doc, band key): replay overwrote.
    n_rows = spark.read.parquet(str(index)).count()
    assert n_rows == spark.read.parquet(str(index)).dropDuplicates(["doc_id", "bkey"]).count()


def test_dedup_state_compaction_bounds_partitions(spark, tmp_path):
    """Long-run maintenance: folding closed trigger partitions of the
    band-key index and decisions log preserves decision content
    exactly, keeps later batches deduping against the folded index,
    and keeps replay of the newest batch idempotent."""
    from pathlib import Path

    from ripcurrent_spark.sinks import COMPACTED_BATCH_ID
    from ripcurrent_spark.streaming.dedup import compact_dedup_state

    index, decisions = str(tmp_path / "idx"), str(tmp_path / "dec")
    fn = streaming_dedup_foreach_batch(index, decisions)
    batches = [
        [(1, A), (2, B)],
        [(3, C)],
        [(4, "totally new words about mountains glaciers and climbing ropes in the alps today")],
    ]
    for i, docs in enumerate(batches):
        fn(spark.createDataFrame(docs, "doc_id long, text string"), i)

    dec_before = sorted(
        (r.doc_id, r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(decisions).collect()
    )
    idx_before = sorted(
        (r.doc_id, r.bkey) for r in spark.read.parquet(index).collect()
    )

    folded = compact_dedup_state(spark, index, decisions, keep_latest=1)
    assert folded == {"index": [0, 1], "decisions": [0, 1]}
    # Partition count bounded: base + newest batch only.
    dec_ids = {int(d.name.split("=", 1)[1]) for d in Path(decisions).glob("_batch_id=*")}
    assert dec_ids == {COMPACTED_BATCH_ID, 2}
    idx_ids = {
        int(d.name.split("=", 1)[1]) for d in Path(index).glob("_bucket=*/_batch_id=*")
    }
    assert idx_ids == {COMPACTED_BATCH_ID, 2}
    # Content preserved exactly.
    assert sorted(
        (r.doc_id, r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(decisions).collect()
    ) == dec_before
    assert sorted(
        (r.doc_id, r.bkey) for r in spark.read.parquet(index).collect()
    ) == idx_before

    # New batch still dedups against FOLDED index rows (doc 1 is in the
    # base partition now).
    fn(spark.createDataFrame([(9, A_NEAR)], "doc_id long, text string"), 3)
    dec = {
        r.doc_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(decisions).collect()
    }
    assert dec[9] == (True, 1)
    # Replay of the kept (newest pre-compaction) batch: idempotent.
    fn(spark.createDataFrame(batches[2], "doc_id long, text string"), 2)
    assert {
        r.doc_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(decisions).collect()
    }[4] == (False, None)
    n_rows = spark.read.parquet(index).count()
    assert n_rows == spark.read.parquet(index).dropDuplicates(["doc_id", "bkey"]).count()


def test_streaming_prints_match_batch_and_replay(spark, tmp_path):
    """r7 verdict #8: the index must maintain each admitted doc's
    128-bit SimHash print — equal to the batch fold of the same text
    — and a replayed batch must leave the prints unchanged, so the
    consensus gate can run on an incrementally-admitted corpus."""
    from ripcurrent_spark.operators import dedup as DD
    from ripcurrent_spark.streaming.dedup import index_prints

    src = tmp_path / "docs"
    index = tmp_path / "index"
    decisions = tmp_path / "decisions"
    t0 = time.time()
    _write_batch(src, "b0.json", [(1, A), (2, B)], t0)
    _write_batch(src, "b1.json", [(3, A_NEAR), (4, C)], t0 + 2)
    q = _start(spark, src, tmp_path, index, decisions)
    q.processAllAvailable()
    q.stop()

    streamed = {
        r["doc_id"]: (r["sh_a"], r["sh_b"], r["sh_c"], r["sh_d"])
        for r in index_prints(spark, index).collect()
    }
    # Only admitted docs carry prints (3 is a dup of 1).
    assert set(streamed) == {1, 2, 4}

    docs = spark.createDataFrame(
        [(1, A), (2, B), (4, C)], "doc_id long, text string"
    )
    batch_prints = {
        r["doc_id"]: (r["sh_a"], r["sh_b"], r["sh_c"], r["sh_d"])
        for r in DD.simhash128_np(
            docs.select("doc_id", DD.tokens("text").alias("toks"))
        ).collect()
    }
    assert streamed == batch_prints, "streamed prints != batch fold"

    # Manual replay of batch 1 (at-least-once): prints unchanged.
    from ripcurrent_spark.streaming.dedup import streaming_dedup_foreach_batch

    fn = streaming_dedup_foreach_batch(str(index), str(decisions))
    fn(spark.createDataFrame([(3, A_NEAR), (4, C)], "doc_id long, text string"), 1)
    replayed = {
        r["doc_id"]: (r["sh_a"], r["sh_b"], r["sh_c"], r["sh_d"])
        for r in index_prints(spark, index).collect()
    }
    assert replayed == streamed, "replay changed the prints"


def test_streaming_consensus_gate(spark, tmp_path):
    """With simhash_max_hamming set, a duplicate verdict needs BOTH
    detectors: A_NEAR estimates Jaccard >= 0.7 against indexed A but
    its print sits at Hamming 4 (fixture sanity-checked), so a <=3
    gate admits it — while a byte-identical replayed doc (Hamming 0)
    is still flagged. The ungated path keeps flagging A_NEAR (the
    existing across-batches test)."""
    from ripcurrent_spark.operators import dedup as DD

    # Fixture sanity: the near pair really straddles the gate.
    docs = spark.createDataFrame(
        [(1, A), (3, A_NEAR)], "doc_id long, text string"
    )
    pr = {
        r["doc_id"]: [r[c] for c in DD.SIMHASH128_COLS]
        for r in DD.simhash128_np(
            docs.select("doc_id", DD.tokens("text").alias("toks"))
        ).collect()
    }
    ham = sum(bin(x ^ y).count("1") for x, y in zip(pr[1], pr[3]))
    assert ham == 4, f"fixture drifted: hamming {ham}"

    index = tmp_path / "index"
    decisions = tmp_path / "decisions"
    fn = streaming_dedup_foreach_batch(
        str(index), str(decisions), simhash_max_hamming=3
    )
    fn(spark.createDataFrame([(1, A), (2, B)], "doc_id long, text string"), 0)
    fn(spark.createDataFrame([(3, A_NEAR), (4, A)], "doc_id long, text string"), 1)

    dec = {
        r.doc_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(str(decisions)).collect()
    }
    assert dec[3] == (False, None), "hamming-4 near-dup must not pass a <=3 gate"
    assert dec[4] == (True, 1), "byte-identical doc (hamming 0) must still match"
