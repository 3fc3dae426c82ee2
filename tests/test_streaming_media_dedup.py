"""Streaming incremental IMAGE dedup (VERDICT r8 #4): per-media
perceptual-hash prints maintained in the bucket-partitioned index so
an incrementally-ingested image corpus feeds the batch pHash
consumers (phash_near_dup_pairs / keep-one) without a rebuild —
streamed prints == batch phash_media, replay-idempotent."""

from __future__ import annotations

import os
import time

import pytest

from ripcurrent_spark.streaming.dedup import (
    media_index_prints,
    streaming_media_dedup_foreach_batch,
)

def _make_hasher():
    """Planted 64-bit perceptual hashes (two 32-bit halves) keyed by
    payload — the injectable hasher seam, same contract as batch.
    Built as a CLOSURE so cloudpickle ships it by value to executors
    (a module-level test function pickles by reference to a module
    the workers can't import)."""
    planted = {
        b"imgA": (0x12345678, 0x0ABCDEF0),
        b"imgA1": (0x12345679, 0x0ABCDEF0),  # 1 bit off imgA
        b"imgC": (0x87654321, 0x7539BDF1),  # far from A
        b"imgD": (0x0F0F0F0F, 0x33CC33CC),  # far from all
        b"imgD1": (0x0F0F0F0E, 0x33CC33CC),  # 1 bit off imgD
    }

    def hasher(payload: bytes) -> tuple[int, int]:
        return planted[bytes(payload)]

    return hasher


_hasher = _make_hasher()


def _write_batch(spark, d, name, rows, mtime):
    d.mkdir(parents=True, exist_ok=True)
    tmp = d.parent / f"_stage_{name}"
    spark.createDataFrame(rows, "media_id long, payload binary").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp))
    part = next(tmp.glob("part-*.parquet"))
    dst = d / name
    part.rename(dst)
    os.utime(dst, (mtime, mtime))  # file source orders batches by mtime


def test_streaming_media_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "media"
    index = tmp_path / "index"
    decisions = tmp_path / "decisions"
    t0 = time.time()
    _write_batch(spark, src, "b0.parquet", [(1, b"imgA"), (2, b"imgC")], t0)

    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            streaming_media_dedup_foreach_batch(
                str(index), str(decisions), hasher=_hasher
            )
        )
        .start()
    )
    q.processAllAvailable()
    # batch 1: a 1-bit twin of an INDEXED image + a fresh one + its
    # in-batch 1-bit twin (5 after 4 checks lowest-id-wins)
    _write_batch(
        spark, src, "b1.parquet", [(3, b"imgA1"), (4, b"imgD"), (5, b"imgD1")], t0 + 2
    )
    q.processAllAvailable()
    q.stop()

    dec = {
        r.media_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(str(decisions)).collect()
    }
    assert dec[1] == (False, None)
    assert dec[2] == (False, None)
    assert dec[3] == (True, 1)  # hamming 1 vs admitted image 1
    assert dec[4] == (False, None)
    assert dec[5] == (True, 4)  # in-batch twin: lower id admitted

    # Streamed prints == batch phash_media with the same hasher.
    from ripcurrent_spark.multimodal.columns import phash_media

    admitted_payloads = [(1, b"imgA"), (2, b"imgC"), (4, b"imgD")]
    batch_prints = {
        r.media_id: (r.ph_a, r.ph_b)
        for r in phash_media(
            spark.createDataFrame(
                admitted_payloads, "media_id long, payload binary"
            ),
            hasher=_hasher,
        ).collect()
    }
    streamed = {
        r.media_id: (r.ph_a, r.ph_b)
        for r in media_index_prints(spark, index).collect()
    }
    assert streamed == batch_prints


def test_streaming_media_replay_idempotent(spark, tmp_path):
    index = str(tmp_path / "index")
    decisions = str(tmp_path / "decisions")
    fn = streaming_media_dedup_foreach_batch(index, decisions, hasher=_hasher)
    b0 = spark.createDataFrame(
        [(1, b"imgA"), (2, b"imgC")], "media_id long, payload binary"
    )
    fn(b0, 0)
    fn(b0, 0)  # at-least-once replay

    dec = {
        r.media_id: (r.is_duplicate, r.dup_of)
        for r in spark.read.parquet(decisions).collect()
    }
    # Not flagged duplicate against their own earlier index rows.
    assert dec == {1: (False, None), 2: (False, None)}
    idx = spark.read.parquet(index)
    assert idx.count() == idx.dropDuplicates(["media_id", "b"]).count()
    assert media_index_prints(spark, index).count() == 2


def test_reingested_media_print_is_atomic_not_chimera(spark, tmp_path):
    """ADVICE r9: a media_id re-ingested with a CHANGED payload has
    two prints in the index; independent per-half max could fabricate
    (max ph_a, max ph_b) — a chimera matching neither version. The
    fold must return one real print: the newest batch's pair."""
    idx = tmp_path / "idx"
    # batch 0: print (9, 1); batch 1 (re-ingest, changed): print (2, 8)
    # elementwise max would fabricate (9, 8) — neither version.
    spark.createDataFrame(
        [(1, 9, 1, "k", 0, 0, 0), (1, 2, 8, "k", 0, 0, 1)],
        "media_id long, ph_a long, ph_b long, bval string, b int, _bucket int, _batch_id int",
    ).write.partitionBy("_bucket", "_batch_id").parquet(str(idx))
    rows = media_index_prints(spark, idx).collect()
    assert len(rows) == 1
    got = (rows[0]["ph_a"], rows[0]["ph_b"])
    assert got == (2, 8), f"chimera or stale print: {got}"


def test_reingested_doc_print_is_atomic_not_chimera(spark, tmp_path):
    """Same hazard on the text twin: sh_a..sh_d folded independently
    across re-ingested versions mixes halves; require the newest
    batch's whole print."""
    from ripcurrent_spark.streaming.dedup import index_prints

    idx = tmp_path / "idx"
    spark.createDataFrame(
        [
            (1, "k", 9, 1, 9, 1, 0, 0),
            (1, "k", 2, 8, 2, 8, 0, 1),
        ],
        "doc_id long, bkey string, sh_a long, sh_b long, sh_c long, sh_d long, "
        "_bucket int, _batch_id int",
    ).write.partitionBy("_bucket", "_batch_id").parquet(str(idx))
    rows = index_prints(spark, idx).collect()
    assert len(rows) == 1
    got = tuple(rows[0][c] for c in ("sh_a", "sh_b", "sh_c", "sh_d"))
    assert got == (2, 8, 2, 8), f"chimera or stale print: {got}"


def test_pre_upgrade_index_raises_clear_error(spark, tmp_path):
    """ADVICE r8: print consumers on an index lacking the print
    columns must fail loudly with a rebuild/backfill message, not an
    AnalysisException or silent nulls."""
    legacy = tmp_path / "legacy_idx"
    spark.createDataFrame(
        [(1, "k", 0, 0)], "doc_id long, bkey string, _bucket int, _batch_id int"
    ).write.partitionBy("_bucket", "_batch_id").parquet(str(legacy))

    from ripcurrent_spark.streaming.dedup import (
        index_prints,
        streaming_dedup_foreach_batch,
    )

    with pytest.raises(ValueError, match="rebuild"):
        index_prints(spark, str(legacy))
    with pytest.raises(ValueError, match="rebuild"):
        media_index_prints(spark, str(legacy))

    fn = streaming_dedup_foreach_batch(
        str(legacy), str(tmp_path / "dec"), simhash_max_hamming=3
    )
    batch = spark.createDataFrame(
        [(9, "some words that are long enough to shingle into grams")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="rebuild"):
        fn(batch, 99)
