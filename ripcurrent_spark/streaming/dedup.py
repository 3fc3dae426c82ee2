"""Incremental near-duplicate detection over a document stream.

Batch dedup (operators/dedup.py) answers "which existing docs
duplicate each other"; a training-data INGEST pipeline needs the
streaming twin: as new documents arrive, decide duplicate-vs-unique
against everything already admitted, and admit only the unique ones —
without ever rescanning the full corpus.

Design (foreachBatch over a persistent LSH band-key index):
- The index holds one row per (admitted doc, LSH band key) with the
  doc's full MinHash signature, parquet-partitioned by
  ``_bucket = pmod(xxhash64(bkey), n_buckets)`` and ``_batch_id``.
- Per micro-batch: compute batch docs' signatures + band keys, read
  ONLY the index buckets containing the batch's band keys (partition
  pruning — per-trigger read I/O scales with batch size, not corpus
  size), join on band key, and estimate Jaccard as the fraction of
  agreeing MinHash components (>= threshold => duplicate). In-batch
  duplicates resolve the same way against batch peers (lower doc_id
  wins).
- Unique docs' band keys append to the index under the batch's own
  ``_batch_id`` partition with dynamic partition overwrite, and
  decisions land under ``_batch_id`` the same way — a replayed batch
  (foreachBatch is at-least-once) overwrites its own partitions
  instead of duplicating them, and the index read excludes the
  current ``_batch_id`` so a replay never matches a doc against its
  own earlier write.

Since r8 the index rows also carry the admitted doc's 128-bit
SimHash print (sh_a..sh_d, the same simhash128_np fold the batch
artifact stores): the multi-signal consensus gate's third detector is
then available on an incrementally-admitted corpus without a batch
rebuild (r7 verdict #8). Prints ride the same bucket-partitioned,
replay-overwritten rows, and ``index_prints`` folds them back to one
row per doc with an idempotent max-merge.

This is the streaming counterpart of `dedup_minhash_lsh` and shares
its signature primitives, so batch and stream admit the same docs.

Since r9 the IMAGE family has the same treatment:
``streaming_media_dedup_foreach_batch`` maintains per-media 64-bit
perceptual-hash prints (the injectable phash_media seam) in a
bucket-partitioned band index with the identical replay discipline,
and ``media_index_prints`` folds it to the (media_id, ph_a, ph_b)
hash frame the batch pHash consumers read — an incrementally-ingested
image corpus runs keep-one without a batch rebuild (VERDICT r8 #4).
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.operators import dedup as DD
from ripcurrent_spark.sinks import has_bucketed_data, key_bucket


def band_keyed_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    rows: int = 3,
) -> DataFrame:
    """(doc_id, sig, bkey) — one row per (doc, band key); docs too
    short to shingle produce no rows (nothing to match on)."""
    t = docs.select(F.col(id_col).alias("doc_id"), DD.tokens(text_col).alias("toks"))
    g = t.select("doc_id", DD.ngrams_of_tokens(F.col("toks")).alias("ngs")).filter(
        F.size("ngs") > 0
    )
    sigs = g.select(
        "doc_id", DD.minhash_from_hashes(DD.shingle_hashes(F.col("ngs")), k).alias("sig")
    )
    return sigs.select(
        "doc_id", "sig", F.explode(DD.lsh_band_keys(F.col("sig"), bands, rows)).alias("bkey")
    )


def _sig_agreement(a, b) -> F.Column:
    """Estimated Jaccard: fraction of equal MinHash components."""
    eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(a)


def in_batch_candidates(bk: DataFrame, max_peers_per_band: int = 32) -> DataFrame:
    """Candidate (doc, peer) pairs among batch peers sharing a band
    key, with a hot-key cap: a band key held by <= `max_peers_per_band`
    batch docs compares all pairs (the batch path's clique), but a
    hotter key compares each doc against the key's MIN doc_id only (a
    star). A degenerate trigger full of near-identical docs therefore
    generates O(n) candidates per band key instead of O(n^2), and
    recall for exactly that degenerate case is preserved — every
    member of a hot near-dup cluster still meets the cluster's
    canonical (min-id) representative, which is the `dup_of` the
    un-capped clique would have assigned anyway (lowest-id-wins).
    Columns: doc_id, sig, peer_id, peer_sig (peer_id < doc_id)."""
    stats = bk.groupBy("bkey").agg(
        F.count(F.lit(1)).alias("_kn"), F.min("doc_id").alias("_kmin")
    )
    bks = bk.join(stats, "bkey")
    cold = bks.filter(F.col("_kn") <= max_peers_per_band).select("bkey", "doc_id", "sig")
    cold_pairs = (
        cold.alias("a")
        .join(cold.alias("b"), "bkey")
        .filter(F.col("b.doc_id") < F.col("a.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sig").alias("sig"),
            F.col("b.doc_id").alias("peer_id"),
            F.col("b.sig").alias("peer_sig"),
        )
    )
    hot = bks.filter(F.col("_kn") > max_peers_per_band)
    reps = hot.filter(F.col("doc_id") == F.col("_kmin")).select(
        "bkey", F.col("doc_id").alias("peer_id"), F.col("sig").alias("peer_sig")
    )
    hot_pairs = (
        hot.filter(F.col("doc_id") != F.col("_kmin"))
        .select("bkey", "doc_id", "sig")
        .join(reps, "bkey")
        .select("doc_id", "sig", "peer_id", "peer_sig")
    )
    return cold_pairs.unionByName(hot_pairs)


def _print_hamming(a_prefix: str, b_prefix: str) -> F.Column:
    return sum(
        F.bit_count(
            F.col(f"{a_prefix}{c}").bitwiseXOR(F.col(f"{b_prefix}{c}"))
        )
        for c in DD.SIMHASH128_COLS
    )


def _require_columns(df: DataFrame, cols, where: str) -> None:
    """ADVICE r8: a pre-r8 index mixed with new partitions makes
    schema inference footer-dependent — the print consumers could
    AnalysisException or silently read null prints depending on which
    footer wins. Enforce the contract at read time with a clear
    remediation instead."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"{where}: index at hand lacks print column(s) {missing} — "
            f"this is a pre-upgrade index; rebuild it (or backfill the "
            f"print columns) before enabling print-based verdicts."
        )


def streaming_dedup_foreach_batch(
    index_dir: str,
    decisions_dir: str,
    threshold: float = 0.7,
    n_buckets: int = 16,
    k: int = 12,
    bands: int = 4,
    rows: int = 3,
    max_peers_per_band: int = 32,
    simhash_max_hamming: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fn for a (doc_id, text) stream: write per-doc
    admit/duplicate decisions and grow the band-key index with the
    admitted docs.

    ``simhash_max_hamming``: when set, a duplicate verdict requires
    detector AGREEMENT — estimated Jaccard >= ``threshold`` AND
    128-bit SimHash print Hamming <= the bound — the streaming twin of
    the batch consensus gate's discipline (a single detector's false
    positives would otherwise silently drop documents at ingest, where
    nothing downstream re-checks them). Uses the prints the index
    already maintains; requires an index whose partitions all carry
    print columns (see CHANGES.md round 8 for pre-r8 indexes)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # 128-bit print per batch doc (same numpy fold as the batch
        # sigstore artifact, so streamed prints == batch prints).
        prints = DD.simhash128_np(
            batch.select("doc_id", DD.tokens("text").alias("toks"))
        )
        bk = (
            band_keyed_signatures(batch, k=k, bands=bands, rows=rows)
            .withColumn("_bucket", key_bucket(["bkey"], n_buckets))
            .join(prints, "doc_id")
        )
        bk = bk.persist()
        touched = sorted({r[0] for r in bk.select("_bucket").distinct().collect()})

        # Candidates from the persisted index: pruned to touched
        # buckets, excluding this batch's own (possibly replayed) rows.
        matches = None
        if touched and has_bucketed_data(index_dir):
            raw = spark.read.parquet(index_dir)
            if simhash_max_hamming is not None:
                _require_columns(
                    raw, DD.SIMHASH128_COLS, "streaming_dedup_foreach_batch"
                )
            idx = (
                raw
                .filter(F.col("_bucket").isin([int(b) for b in touched]))
                .filter(F.col("_batch_id") != batch_id)
                .select(
                    F.col("doc_id").alias("idx_doc_id"),
                    F.col("sig").alias("idx_sig"),
                    "bkey",
                    *[
                        F.col(c).alias(f"idx_{c}")
                        for c in (DD.SIMHASH128_COLS if simhash_max_hamming is not None else ())
                    ],
                )
            )
            matches = (
                bk.join(idx, "bkey")
                .filter(F.col("idx_doc_id") != F.col("doc_id"))
                .withColumn("est_j", _sig_agreement(F.col("sig"), F.col("idx_sig")))
                .filter(F.col("est_j") >= threshold)
            )
            if simhash_max_hamming is not None:
                matches = matches.filter(
                    _print_hamming("", "idx_") <= simhash_max_hamming
                )
            matches = matches.groupBy("doc_id").agg(
                F.min("idx_doc_id").alias("dup_of")
            )

        # In-batch duplicates: band-key join against batch peers with
        # the hot-key cap (see in_batch_candidates); the lower doc_id
        # is the canonical survivor.
        peers = (
            in_batch_candidates(bk, max_peers_per_band)
            .withColumn("est_j", _sig_agreement(F.col("sig"), F.col("peer_sig")))
            .filter(F.col("est_j") >= threshold)
        )
        if simhash_max_hamming is not None:
            pr = bk.select("doc_id", *DD.SIMHASH128_COLS).distinct()
            peers = (
                peers.join(pr, "doc_id")
                .join(
                    pr.select(
                        F.col("doc_id").alias("peer_id"),
                        *[F.col(c).alias(f"peer_{c}") for c in DD.SIMHASH128_COLS],
                    ),
                    "peer_id",
                )
                .filter(_print_hamming("", "peer_") <= simhash_max_hamming)
            )
        peers = peers.groupBy("doc_id").agg(F.min("peer_id").alias("dup_of_peer"))

        decisions = (
            batch.select("doc_id").distinct()
            .join(matches, "doc_id", "left") if matches is not None
            else batch.select("doc_id").distinct().withColumn("dup_of", F.lit(None).cast("long"))
        )
        decisions = (
            decisions.join(peers, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("dup_of", "dup_of_peer").alias("dup_of"),
            )
            .withColumn("is_duplicate", F.col("dup_of").isNotNull())
            .withColumn("_batch_id", F.lit(batch_id))
        )
        # Writer-level option, NOT spark.conf.set: a session-wide
        # dynamic mode would silently change every other overwrite in
        # the session (tmp-stage writes rely on static truncation).
        (
            decisions.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(decisions_dir)
        )

        admitted = decisions.filter(~F.col("is_duplicate")).select("doc_id")
        (
            bk.join(admitted, "doc_id", "left_semi")
            .select("doc_id", "sig", "bkey", "_bucket", *DD.SIMHASH128_COLS)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket", "_batch_id")
            .parquet(index_dir)
        )
        bk.unpersist()

    return _apply


def compact_dedup_state(
    spark,
    index_dir: str,
    decisions_dir: str,
    keep_latest: int = 1,
    id_col: str = "doc_id",
) -> dict[str, list[int]]:
    """Long-run maintenance for the streaming dedup state: both the
    band-key index (``_bucket=*/_batch_id=*``) and the decisions log
    (``_batch_id=*``) accrue one partition per trigger forever; fold
    closed batches into each dir's compacted base (sinks.
    compact_log_batches — crash-safe, replay-compatible: the newest
    `keep_latest` batch partitions stay in place so an at-least-once
    replay still overwrites its own partition). Index reads keep
    working unchanged — the base's ``_batch_id=-1`` never equals a
    live batch id, so the own-batch exclusion filter is unaffected.

    The INDEX folds with ``collapse_key=(id_col,)``: the base keeps
    one admitted VERSION per id — the newest folded one — so the
    prints folds (index_prints / media_index_prints), whose ordering
    key is ``_batch_id``, never tie between two base versions of a
    re-ingested id and silently keep the older print (ADVICE r10 #2).
    The DECISIONS log folds uncollapsed: every decision is history.
    Pass ``id_col="media_id"`` for the media twin's state. Run
    offline between triggers, like any OPTIMIZE."""
    from ripcurrent_spark.sinks import compact_log_batches

    return {
        "index": compact_log_batches(
            spark, index_dir, keep_latest=keep_latest, collapse_key=(id_col,)
        ),
        "decisions": compact_log_batches(spark, decisions_dir, keep_latest=keep_latest),
    }


def index_prints(spark, index_dir: str | Path) -> DataFrame:
    """One (doc_id, sh_a..sh_d) row per ADMITTED doc, folded from the
    band-key index rows ATOMICALLY — max of struct(_batch_id, sh_a..
    sh_d), the whole print from the newest batch that wrote the doc.
    Folding the four halves independently could fabricate a CHIMERA
    print mixing halves from different ingested versions of a
    re-ingested doc (ADVICE r9, flagged on the media twin; same
    hazard here). Within one batch every band row of a doc carries
    the same print, so the struct-max stays idempotent under band-key
    duplication and replays; under compaction the ordering key stays
    sound because the compactor collapses the base to ONE admitted
    version per doc (compact_dedup_state's collapse_key — ADVICE r10
    #2: with two folded versions both at ``_batch_id=-1`` the
    struct-max would tie on the batch id and keep whichever print is
    lexicographically larger, possibly the older version). This is
    the frame the consensus gate's SimHash detector reads when the
    corpus is maintained incrementally."""
    idx = spark.read.parquet(str(index_dir))
    _require_columns(idx, (*DD.SIMHASH128_COLS, "_batch_id"), "index_prints")
    return (
        idx.groupBy("doc_id")
        .agg(F.max(F.struct("_batch_id", *DD.SIMHASH128_COLS)).alias("_m"))
        .select(
            "doc_id",
            *[F.col(f"_m.{c}").alias(c) for c in DD.SIMHASH128_COLS],
        )
    )


PHASH_BAND_COLS = ("ph_a", "ph_b")


def _phash_bands(hashes: DataFrame) -> DataFrame:
    """(media_id, ph_a, ph_b, b, bval): 4 x 16-bit band slices of the
    64-bit perceptual hash — identical band math to the batch
    phash_near_dup_pairs (multimodal/columns.py), so streamed and
    batch candidate generation share recall guarantees (Hamming <= 3
    flips at most 3 of 4 bands)."""
    return hashes.select(
        "media_id",
        "ph_a",
        "ph_b",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"), F.shiftright("ph_a", 16).alias("bval")),
                F.struct(F.lit(1).alias("b"), F.col("ph_a").bitwiseAND(65535).alias("bval")),
                F.struct(F.lit(2).alias("b"), F.shiftright("ph_b", 16).alias("bval")),
                F.struct(F.lit(3).alias("b"), F.col("ph_b").bitwiseAND(65535).alias("bval")),
            )
        ).alias("band"),
    ).select(
        "media_id", "ph_a", "ph_b",
        F.col("band.b").alias("b"), F.col("band.bval").alias("bval"),
    )


def streaming_media_dedup_foreach_batch(
    index_dir: str,
    decisions_dir: str,
    ham_t: int = 3,
    n_buckets: int = 16,
    max_peers_per_band: int = 32,
    hasher=None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fn for a (media_id, payload) MEDIA stream — the
    image-family twin of streaming_dedup_foreach_batch (VERDICT r8
    #4: r8 gave the text index 128-bit prints; the image family had
    no streaming path at all, so an incrementally-ingested image
    corpus needed a full batch rebuild before mm_phash_keep_one
    could run).

    Per trigger: compute each payload's 64-bit perceptual hash (the
    injectable phash_media seam — same hasher contract as batch, so
    STREAMED PRINTS == BATCH PRINTS by construction), slice 4 x
    16-bit bands, read only the touched index buckets (partition
    pruning: per-trigger I/O scales with batch size, not corpus
    size), and flag a duplicate on band agreement + exact Hamming <=
    ``ham_t`` against admitted media and in-batch peers (hot bands
    capped to a star against the band's min id — same bounded-work
    discipline as the text path). Admitted media's band rows append
    under (_bucket, _batch_id) with dynamic partition overwrite;
    decisions land under _batch_id — a replayed batch overwrites its
    own partitions (at-least-once safe) and never matches against
    its own earlier write. ``media_index_prints`` folds the index
    back to one (media_id, ph_a, ph_b) row per admitted media — the
    hash frame mm_phash_keep_one-style batch consumers read, no
    rebuild. The payload itself never lands in the index: index rows
    are hash+band-sized."""
    from ripcurrent_spark.multimodal.columns import phash_media

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        hashes = phash_media(batch.select("media_id", "payload"), hasher=hasher)
        bk = (
            _phash_bands(hashes)
            .withColumn("_bucket", key_bucket(["b", "bval"], n_buckets))
            .persist()
        )
        touched = sorted({r[0] for r in bk.select("_bucket").distinct().collect()})

        hamming = (
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("idx_pa")))
            + F.bit_count(F.col("ph_b").bitwiseXOR(F.col("idx_pb")))
        ).cast("int")
        matches = None
        if touched and has_bucketed_data(index_dir):
            raw = spark.read.parquet(index_dir)
            _require_columns(raw, PHASH_BAND_COLS, "streaming_media_dedup")
            idx = (
                raw.filter(F.col("_bucket").isin([int(x) for x in touched]))
                .filter(F.col("_batch_id") != batch_id)
                .select(
                    F.col("media_id").alias("idx_media_id"),
                    F.col("ph_a").alias("idx_pa"),
                    F.col("ph_b").alias("idx_pb"),
                    "b",
                    "bval",
                )
            )
            matches = (
                bk.join(idx, ["b", "bval"])
                .filter(F.col("idx_media_id") != F.col("media_id"))
                .filter(hamming <= ham_t)
                .groupBy("media_id")
                .agg(F.min("idx_media_id").alias("dup_of"))
            )

        # In-batch peers: band join with the hot-band star cap.
        stats = bk.groupBy("b", "bval").agg(
            F.count(F.lit(1)).alias("_kn"), F.min("media_id").alias("_kmin")
        )
        bks = bk.join(stats, ["b", "bval"])
        cold = bks.filter(F.col("_kn") <= max_peers_per_band).select(
            "b", "bval", "media_id", "ph_a", "ph_b"
        )
        peer_side = cold.select(
            "b", "bval",
            F.col("media_id").alias("peer_id"),
            F.col("ph_a").alias("idx_pa"),
            F.col("ph_b").alias("idx_pb"),
        )
        cold_pairs = (
            cold.join(peer_side, ["b", "bval"])
            .filter(F.col("peer_id") < F.col("media_id"))
        )
        hot = bks.filter(F.col("_kn") > max_peers_per_band)
        reps = hot.filter(F.col("media_id") == F.col("_kmin")).select(
            "b", "bval",
            F.col("media_id").alias("peer_id"),
            F.col("ph_a").alias("idx_pa"),
            F.col("ph_b").alias("idx_pb"),
        )
        hot_pairs = (
            hot.filter(F.col("media_id") != F.col("_kmin"))
            .select("b", "bval", "media_id", "ph_a", "ph_b")
            .join(reps, ["b", "bval"])
        )
        peers = (
            cold_pairs.unionByName(hot_pairs)
            .filter(hamming <= ham_t)
            .groupBy("media_id")
            .agg(F.min("peer_id").alias("dup_of_peer"))
        )

        base = batch.select("media_id").distinct()
        decisions = (
            base.join(matches, "media_id", "left")
            if matches is not None
            else base.withColumn("dup_of", F.lit(None).cast("long"))
        )
        decisions = (
            decisions.join(peers, "media_id", "left")
            .select(
                "media_id",
                F.coalesce("dup_of", "dup_of_peer").alias("dup_of"),
            )
            .withColumn("is_duplicate", F.col("dup_of").isNotNull())
            .withColumn("_batch_id", F.lit(batch_id))
        )
        (
            decisions.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(decisions_dir)
        )
        admitted = decisions.filter(~F.col("is_duplicate")).select("media_id")
        (
            bk.join(admitted, "media_id", "left_semi")
            .select("media_id", "ph_a", "ph_b", "b", "bval", "_bucket")
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket", "_batch_id")
            .parquet(index_dir)
        )
        bk.unpersist()

    return _apply


def media_index_prints(spark, index_dir: str | Path) -> DataFrame:
    """One (media_id, ph_a, ph_b) row per ADMITTED media — the hash
    frame batch consumers (phash_near_dup_pairs / mm_phash_keep_one's
    pipeline) read without a corpus rebuild.

    The print is folded ATOMICALLY: max of struct(_batch_id, ph_a,
    ph_b), i.e. the whole row from the newest batch that wrote the
    media. Folding ph_a and ph_b independently could fabricate a
    CHIMERA print — ph_a from one ingested version, ph_b from another
    — matching neither version if the same media_id were ever
    re-ingested with a changed payload (ADVICE r9). Within one batch
    every band row of a media carries the same print, so the
    struct-max is deterministic under band duplication and replays;
    compaction keeps the ordering key sound by collapsing the base to
    one admitted version per media (compact_dedup_state with
    ``id_col="media_id"`` — ADVICE r10 #2)."""
    idx = spark.read.parquet(str(index_dir))
    _require_columns(idx, (*PHASH_BAND_COLS, "_batch_id"), "media_index_prints")
    return (
        idx.groupBy("media_id")
        .agg(F.max(F.struct("_batch_id", "ph_a", "ph_b")).alias("_m"))
        .select(
            "media_id",
            F.col("_m.ph_a").alias("ph_a"),
            F.col("_m.ph_b").alias("ph_b"),
        )
    )


def read_decisions(spark, decisions_dir: str) -> DataFrame:
    return spark.read.parquet(decisions_dir)


def index_size(spark, index_dir: str | Path) -> int:
    return spark.read.parquet(str(index_dir)).select("doc_id").distinct().count()
