"""Round-11 tests: the sqrt(N) IVF cell-count policy (VERDICT r10
#1), the shared exchange-free spread gate (VERDICT r10 #7), and
companions added this round."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.operators.clustering import ivf_stride, ivf_stride_sql
from tests.conftest import SF_ORACLE

# ----------------------------------- IVF sqrt(N) cell-count policy


def test_ivf_stride_is_sublinear_cell_count():
    """n_cells ~ N / stride must be ~sqrt(N), never a corpus fraction:
    stride^2 >= N pins n_cells <= sqrt(N) + 1 at EVERY corpus size
    (the r10 fixed stride of 25 gave N/25 cells — linear)."""
    for n in (1, 24, 25, 624, 625, 626, 2_500, 49_999, 10**6, 10**10, 10**12):
        s = ivf_stride(n)
        assert s * s >= n, f"N={n}: stride {s} leaves a super-sqrt cell count"
        n_cells = math.ceil(n / s)
        assert n_cells <= math.isqrt(n) + 1, f"N={n}: {n_cells} cells"
        # and the floor keeps tiny corpora from one-vector cells
        assert s >= 25


def test_ivf_stride_grows_with_corpus():
    """The policy point of the r11 fix: 100x the corpus must NOT mean
    100x the centroids (it means ~10x)."""
    base = 10**6
    cells = lambda n: math.ceil(n / ivf_stride(n))  # noqa: E731
    assert cells(100 * base) < 15 * cells(base)


@pytest.mark.parametrize(
    "n", [1, 24, 25, 26, 624, 625, 626, 2_500, 49_999, 50_000, 10**8]
)
def test_ivf_stride_sql_twin_matches(n):
    """The oracle-side scalar subquery must derive the IDENTICAL
    stride from the identical count — both engines ceil the same
    IEEE-754 double sqrt."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW corpus AS SELECT * FROM range({n})")
    got = con.sql(f"SELECT {ivf_stride_sql('corpus')}").fetchone()[0]
    con.close()
    assert got == ivf_stride(n)


def test_ivf_cell_table_uses_corpus_derived_stride(spark):
    """The materialized artifact's distinct cell count must track
    ceil(N / ivf_stride(N)) (every stride-th id is a centroid and
    every centroid wins its own assignment under rounded L2 with id
    tie-break... its distance to itself is 0), not N/25."""
    from ripcurrent_spark.operators.sigstore import ivf_cell_table
    from ripcurrent_spark.queries.ann import _vectors

    n = _vectors(spark, SF_ORACLE).count()
    stride = ivf_stride(n)
    cells = ivf_cell_table(spark, SF_ORACLE)
    n_cells = cells.select("cell").distinct().count()
    expected = len(range(0, n, stride))
    assert n_cells == expected
    assert cells.count() == n


# ----------------------------------- checkpoint-dir ambient state


def _ckpt_dir(spark):
    opt = spark.sparkContext._jsc.sc().getCheckpointDir()
    return opt.get() if opt.isDefined() else None


def test_connected_components_leaves_no_ambient_checkpoint_dir(spark, tmp_path):
    """ADVICE r10 #5: when the caller had NO checkpoint dir, a
    reliable-mode call must not leave its per-call dir set for the
    rest of the process (later unrelated df.checkpoint() calls would
    silently write into the caller-owned directory)."""
    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.operators.dedup import (
        _clear_checkpoint_dir,
        connected_components,
    )

    sc = spark.sparkContext
    _clear_checkpoint_dir(sc)
    assert _ckpt_dir(spark) is None, "could not reach the no-dir state"
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    connected_components(pairs, "a", "b", checkpoint_dir=str(tmp_path)).count()
    cachereg.release_tracked()
    assert _ckpt_dir(spark) is None, "per-call checkpoint dir stayed ambient"


def test_connected_components_restores_prior_checkpoint_dir(spark, tmp_path):
    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.operators.dedup import (
        _clear_checkpoint_dir,
        connected_components,
    )

    sc = spark.sparkContext
    prior = str(tmp_path / "prior")
    sc.setCheckpointDir(prior)
    try:
        pairs = spark.createDataFrame([(1, 2)], "a long, b long")
        connected_components(
            pairs, "a", "b", checkpoint_dir=str(tmp_path / "call")
        ).count()
        cachereg.release_tracked()
        got = _ckpt_dir(spark)
        # setCheckpointDir nests a fresh UUID level on every call, so
        # the restored dir is UNDER the caller's root, not equal to it.
        assert got is not None and "/prior/" in got
        assert "/call/" not in got, "per-call dir leaked into the restore"
    finally:
        _clear_checkpoint_dir(sc)


# ----------------------------------- empty-state streaming snapshots


def test_streaming_state_snapshots_survive_empty_batches(spark, tmp_path):
    """ADVICE r10 #4: a routine empty micro-batch (or no trigger yet)
    must not break the snapshot read path — previously an empty
    dynamic overwrite wrote only _SUCCESS and the schema-inferring
    read raised until a non-empty trigger landed."""
    from ripcurrent_spark.streaming.dsir import (
        dsir_model_snapshot,
        streaming_dsir_foreach_batch,
    )
    from ripcurrent_spark.streaming.wordfreq import (
        streaming_word_counts_foreach_batch,
        word_counts_snapshot,
    )

    dsir_state, wf_state = str(tmp_path / "dsir"), str(tmp_path / "wf")
    # Not-yet-created state dirs read as empty models/tables.
    assert dsir_model_snapshot(spark, dsir_state).count() == 0
    assert word_counts_snapshot(spark, wf_state).count() == 0
    # An empty first micro-batch is skipped; snapshots still read.
    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    streaming_dsir_foreach_batch(dsir_state)(empty, 0)
    streaming_word_counts_foreach_batch(wf_state)(
        empty.select("doc_id", "text"), 0
    )
    assert dsir_model_snapshot(spark, dsir_state).count() == 0
    assert word_counts_snapshot(spark, wf_state).count() == 0
    # A later real trigger lands and the snapshots carry its content.
    docs = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat"), (2, "de", "der hund lief weg")],
        "doc_id long, lang string, text string",
    )
    streaming_dsir_foreach_batch(dsir_state)(docs, 1)
    streaming_word_counts_foreach_batch(wf_state)(docs.select("doc_id", "text"), 1)
    assert dsir_model_snapshot(spark, dsir_state).count() > 0
    wc = {r.word: r.n for r in word_counts_snapshot(spark, wf_state).collect()}
    assert wc["the"] == 2


# ----------------------------------- mergeable-state sum-compaction


def _docs_table(spark):
    from ripcurrent_spark.io import load

    return load(spark, SF_ORACLE, "documents").select("doc_id", "lang", "text")


def test_charlm_state_compaction_bounds_rows(spark, tmp_path):
    """r11 sum-merge compaction: after folding closed batches the
    model snapshot is unchanged, the base holds ONE summed row per
    bigram (not one partial-set per trigger), partitions are bounded,
    and a replay of the kept batch stays idempotent."""
    from pathlib import Path

    from ripcurrent_spark.sinks import COMPACTED_BATCH_ID
    from ripcurrent_spark.streaming.charlm import (
        charlm_model_snapshot,
        compact_charlm_state,
        streaming_charlm_foreach_batch,
    )

    state = str(tmp_path / "lm")
    docs = _docs_table(spark).select("doc_id", "text")
    fn = streaming_charlm_foreach_batch(state)
    for i in range(3):
        fn(docs.filter(F.col("doc_id") % 3 == i), i)

    def model():
        return sorted(
            (r["b"], str(r["lnp"]))
            for r in charlm_model_snapshot(spark, state).collect()
        )

    before = model()
    assert compact_charlm_state(spark, state, keep_latest=1) == [0, 1]
    ids = {int(d.name.split("=", 1)[1]) for d in Path(state).glob("_batch_id=*")}
    assert ids == {COMPACTED_BATCH_ID, 2}
    assert model() == before
    base = spark.read.parquet(state).filter(
        F.col("_batch_id") == COMPACTED_BATCH_ID
    )
    assert base.count() == base.select("b").distinct().count()
    fn(docs.filter(F.col("doc_id") % 3 == 2), 2)  # replay the kept batch
    assert model() == before


def test_docstats_compaction_preserves_stats(spark, tmp_path):
    """Both doc-stats tables sum-compact: the assembled stats row is
    unchanged and the totals base collapses to ONE row."""
    from pathlib import Path

    from ripcurrent_spark.sinks import COMPACTED_BATCH_ID
    from ripcurrent_spark.streaming.docstats import (
        compact_doc_stats_state,
        stats_for_terms,
        streaming_doc_stats_foreach_batch,
    )

    state = str(tmp_path / "state")
    docs = _docs_table(spark).select("doc_id", "text")
    fn = streaming_doc_stats_foreach_batch(state)
    for i in range(3):
        fn(docs.filter(F.col("doc_id") % 3 == i), i)
    terms = ("spark", "join", "stream")
    before = stats_for_terms(spark, state, terms).collect()
    folded = compact_doc_stats_state(spark, state, keep_latest=1)
    assert folded == {"df": [0, 1], "totals": [0, 1]}
    assert stats_for_terms(spark, state, terms).collect() == before
    tot_base = spark.read.parquet(str(Path(state) / "totals")).filter(
        F.col("_batch_id") == COMPACTED_BATCH_ID
    )
    assert tot_base.count() == 1


def test_dsir_and_wordfreq_compaction_preserve_snapshots(spark, tmp_path):
    from ripcurrent_spark.streaming.dsir import (
        compact_dsir_state,
        dsir_model_snapshot,
        streaming_dsir_foreach_batch,
    )
    from ripcurrent_spark.streaming.wordfreq import (
        compact_word_counts_state,
        streaming_word_counts_foreach_batch,
        word_counts_snapshot,
    )

    docs = _docs_table(spark)
    ds, ws = str(tmp_path / "dsir"), str(tmp_path / "wf")
    for i in range(3):
        part = docs.filter(F.col("doc_id") % 3 == i)
        streaming_dsir_foreach_batch(ds)(part, i)
        streaming_word_counts_foreach_batch(ws)(part.select("doc_id", "text"), i)
    dm = sorted(
        (r["b"], str(r["w"])) for r in dsir_model_snapshot(spark, ds).collect()
    )
    wc = sorted(
        (r["word"], r["n"]) for r in word_counts_snapshot(spark, ws).collect()
    )
    assert compact_dsir_state(spark, ds) == [0, 1]
    assert compact_word_counts_state(spark, ws) == [0, 1]
    assert dm == sorted(
        (r["b"], str(r["w"])) for r in dsir_model_snapshot(spark, ds).collect()
    )
    assert wc == sorted(
        (r["word"], r["n"]) for r in word_counts_snapshot(spark, ws).collect()
    )


# ----------------------------------- exclude_exact injective group key


def test_exclude_exact_group_key_is_injective(spark):
    """ADVICE r10 #3: under the old concat_ws(',') serialization,
    ["a","b"] and ["a,b"] keyed identically, so doc 2 collapsed into
    doc 1's "exact" group and its genuine containment pair (2,3)
    silently vanished from a guaranteed-recall candidate set. The
    JSON-encoded key must keep them distinct."""
    from ripcurrent_spark.operators.dedup import containment_candidates

    g = spark.createDataFrame(
        [
            (1, ["a", "b"]),
            (2, ["a,b"]),
            (3, ["a,b", "z"]),
        ],
        "doc_id long, ngs array<string>",
    )
    pairs = sorted(
        (r.id_a, r.id_b)
        for r in containment_candidates(g, 9, 10, exclude_exact=True).collect()
    )
    assert (2, 3) in pairs, "distinct multisets were collapsed as exact dups"


# ----------------------------------- newest-wins compaction collapse


def test_compaction_collapse_keeps_newest_version(spark, tmp_path):
    """ADVICE r10 #2: a re-ingested id with a changed print across two
    FOLDED batches — after compaction the base must hold only the
    newest version. Without the collapse both versions land at
    _batch_id=-1 and the prints fold's struct-max ties on the batch id
    and keeps the lexicographically larger (here OLDER) print."""
    from ripcurrent_spark.sinks import COMPACTED_BATCH_ID, compact_log_batches
    from ripcurrent_spark.streaming.dedup import media_index_prints

    root = str(tmp_path / "idx")
    # batch 0: media 1 print (9, 9) — lexicographically larger, older.
    # batch 1: media 1 print (2, 2) — the newest admitted version.
    for bid, (a, b) in [(0, (9, 9)), (1, (2, 2))]:
        (
            spark.createDataFrame(
                [(1, a, b)], "media_id long, ph_a long, ph_b long"
            )
            .withColumn("_bucket", F.lit(0))
            .withColumn("_batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket", "_batch_id")
            .parquet(root)
        )
    folded = compact_log_batches(
        spark, root, keep_latest=0, collapse_key=("media_id",)
    )
    assert folded == [0, 1]
    base = [
        (r.media_id, r.ph_a, r.ph_b, r["_batch_id"])
        for r in spark.read.parquet(root).collect()
    ]
    assert base == [(1, 2, 2, COMPACTED_BATCH_ID)]
    prints = media_index_prints(spark, root).collect()
    assert [(r.media_id, r.ph_a, r.ph_b) for r in prints] == [(1, 2, 2)]


# ----------------------------------- cachereg thread ownership


def test_scoped_release_is_thread_owned(spark):
    """ADVICE r10 #1: a concurrent thread's track() while a scope is
    open must survive the scope's exit (the old length-suffix release
    unpersisted the foreign handle and leaked the scope's own), and
    the scope's own handle must be released."""
    import threading

    from ripcurrent_spark.operators import cachereg

    cachereg.release_tracked()
    mine = spark.createDataFrame([(1,)], "x long").persist()
    theirs = spark.createDataFrame([(2,)], "y long").persist()
    theirs.count()

    def _foreign_track():
        cachereg.track(theirs)

    with cachereg.scoped():
        cachereg.track(mine)
        mine.count()
        t = threading.Thread(target=_foreign_track)
        t.start()
        t.join()
    assert cachereg.tracked_frames() == [theirs], "foreign handle was eaten"
    assert theirs.storageLevel.useMemory, "foreign cache was drained"
    assert not mine.storageLevel.useMemory, "scope leaked its own handle"
    assert cachereg.release_tracked() == 1


def test_scoped_same_thread_nesting_releases_own_tail(spark):
    from ripcurrent_spark.operators import cachereg

    cachereg.release_tracked()
    outer = spark.range(3).persist()
    inner = spark.range(4).persist()
    with cachereg.scoped():
        cachereg.track(outer)
        with cachereg.scoped():
            cachereg.track(inner)
        assert cachereg.tracked_frames() == [outer]
    assert cachereg.tracked_frames() == []


# ----------------------------------- BPE trainer lineage cut


def _bpe_corpus(spark, n_words=300):
    """Deterministic word table whose hex-alphabet pair space supports
    100+ merges (32 symbols/word, 16-char alphabet)."""
    import hashlib

    rows = [
        (hashlib.md5(f"bpe{i}".encode()).hexdigest(), n_words - i)
        for i in range(n_words)
    ]
    return spark.createDataFrame(rows, "word string, n long")


def test_bpe_train_100_merges_flat_per_round(spark):
    """The planted quadratic-recompute probe (VERDICT r10 #2): with
    the every-8-rounds localCheckpoint cut, per-round wall time must
    stay FLAT across 100 merges. Without the cut, round k recomputes
    k-1 chained replaces (late rounds ~10x early); with it the plan
    carries at most 8, so an 8x median bound discriminates cleanly
    while shrugging off this VM's ambient noise."""
    import statistics

    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.operators.text import bpe_train

    secs: list[float] = []
    merges = bpe_train(_bpe_corpus(spark), 100, round_secs=secs)
    cachereg.release_tracked()
    assert len(merges) == 100, "pair space dried up — corpus too small"
    assert len(secs) == 100
    early = statistics.median(secs[2:13])
    late = statistics.median(secs[-11:])
    assert late < 8 * max(early, 0.02), f"late rounds regressed: {early=} {late=}"


def test_bpe_train_cut_is_semantically_invisible(spark, monkeypatch):
    """The lineage cut must not change a single selected merge: 20
    rounds with the cut cadence == 20 rounds with cuts disabled."""
    from ripcurrent_spark.operators import cachereg, text as textops

    with_cut = textops.bpe_train(_bpe_corpus(spark, 60), 20)
    monkeypatch.setattr(textops, "_BPE_CUT_EVERY", 10**9)
    no_cut = textops.bpe_train(_bpe_corpus(spark, 60), 20)
    cachereg.release_tracked()
    assert with_cut == no_cut


# ----------------------------------- artifact-pair coherence


def _plant_sidecar(cache, kind, key, fp):
    from ripcurrent_spark.operators import sigstore

    d = sigstore.artifact_dir(kind, key)
    d.mkdir(parents=True, exist_ok=True)
    import json

    (d / sigstore._KEY_FILE).write_text(
        json.dumps({"key": key, "source": fp[0], "size": fp[1], "mtime_ns": fp[2]})
    )


def test_assert_coherent_artifacts(monkeypatch, tmp_path):
    """Equal recorded fingerprints pass; a mixed pair (out-of-band
    cache surgery) raises; unbuilt members are skipped."""
    from ripcurrent_spark.operators.sigstore import assert_coherent_artifacts

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_CACHE", str(tmp_path))
    fp = ("/data/embeddings.parquet", 111, 222)
    _plant_sidecar(tmp_path, "ivf_cells", "k1", fp)
    _plant_sidecar(tmp_path, "pq_codes", "k2", fp)
    assert_coherent_artifacts({"ivf_cells": "k1", "pq_codes": "k2"})
    # unbuilt third member is skipped
    assert_coherent_artifacts(
        {"ivf_cells": "k1", "pq_codes": "k2", "pq_codebooks": "k3"}
    )
    _plant_sidecar(tmp_path, "pq_codes", "k2", (fp[0], 111, 999))
    with pytest.raises(AssertionError, match="incoherent artifact pair"):
        assert_coherent_artifacts({"ivf_cells": "k1", "pq_codes": "k2"})


def test_ivfpq_pair_coherent_after_build(spark):
    """The deployed pair passes its own gate once built the normal
    way (coherent by key derivation)."""
    from ripcurrent_spark.operators.sigstore import (
        assert_ivfpq_coherent,
        ivf_cell_table,
        pq_code_table,
    )

    ivf_cell_table(spark, SF_ORACLE).count()
    pq_code_table(spark, SF_ORACLE).count()
    assert_ivfpq_coherent(SF_ORACLE)


# ----------------------------------- multiprobe recall lever


def test_multiprobe_buys_recall(spark):
    """The nprobe lever must actually work: mean recall@5 of the
    nprobe=2 search strictly exceeds nprobe=1 on the test corpus
    (0.80 -> 0.92 at sf0.001, pinned loosely so a data regen moves
    the numbers without breaking the property)."""
    from ripcurrent_spark.queries.ann import (
        ann_ivf_multiprobe_recall,
        ann_ivf_recall,
    )

    r1 = ann_ivf_recall(spark, SF_ORACLE).agg(F.avg("recall_at_5")).collect()[0][0]
    r2 = (
        ann_ivf_multiprobe_recall(spark, SF_ORACLE)
        .agg(F.avg("recall_at_5"))
        .collect()[0][0]
    )
    assert r2 > r1, f"second probe bought nothing: nprobe1={r1} nprobe2={r2}"


# ----------------------------------- shared spread gate


def test_spread_if_narrow_scan_spreads_narrow_exchange_free(spark):
    from ripcurrent_spark.operators.hints import spread_if_narrow_scan

    sc = spark.sparkContext
    narrow = spark.range(0, 1000, 1, 2).withColumnRenamed("id", "vec_id")
    out = spread_if_narrow_scan(narrow, sc.defaultParallelism, "vec_id")
    assert out.rdd.getNumPartitions() == sc.defaultParallelism


def test_spread_if_narrow_scan_passes_through_exchanged_input(spark):
    """An input whose plan already contains an Exchange is being
    spread by its own shuffle — the probe must not re-shuffle it."""
    from ripcurrent_spark.operators.hints import spread_if_narrow_scan

    sc = spark.sparkContext
    exchanged = (
        spark.range(0, 1000, 1, 2)
        .withColumnRenamed("id", "vec_id")
        .repartition(3, "vec_id")
    )
    out = spread_if_narrow_scan(exchanged, sc.defaultParallelism, "vec_id")
    assert out is exchanged


# ----------------------------------- argpartition top-k exactness


def _full_sort_topk(st, kk):
    import numpy as np

    o = np.argsort(-st, axis=1, kind="stable")[:, :kk]
    return o, np.take_along_axis(st, o, axis=1)


def test_row_topk_matches_full_sort_random():
    import numpy as np

    from ripcurrent_spark.operators.similarity import _row_topk_np

    rng = np.random.default_rng(7)
    st = rng.standard_normal((40, 500))
    top, ts = _row_topk_np(st, 6, np)
    ref_top, ref_ts = _full_sort_topk(st, 6)
    assert np.array_equal(top, ref_top)
    assert np.array_equal(ts, ref_ts)


def test_row_topk_matches_full_sort_wide_tie_class():
    """A tie class wider than the argpartition margin straddles the
    partition edge — the per-row boundary check must fire the full
    stable-argsort fallback and keep (value DESC, column ASC) exact."""
    import numpy as np

    from ripcurrent_spark.operators.similarity import (
        _TOPK_MARGIN,
        _row_topk_np,
    )

    rng = np.random.default_rng(11)
    n_cols = 4 * (_TOPK_MARGIN + 6)
    st = rng.standard_normal((8, n_cols))
    # Row 3: columns 10.. all share the maximum value — a tie class
    # far wider than kk + margin, so the kk-th selected value equals
    # the partition boundary and argpartition alone cannot pick the
    # lowest column indices.
    st[3, 10:] = 5.0
    # Row 5: everything ties — degenerate case.
    st[5, :] = 1.25
    top, ts = _row_topk_np(st, 6, np)
    ref_top, ref_ts = _full_sort_topk(st, 6)
    assert np.array_equal(top, ref_top)
    assert np.array_equal(ts, ref_ts)
    # The tie rows picked the LOWEST column indices of the tie class.
    assert list(top[3]) == [10, 11, 12, 13, 14, 15]
    assert list(top[5]) == [0, 1, 2, 3, 4, 5]


def test_row_topk_neginf_rows_are_safe_without_fallback():
    """Rows whose kk-th value is -inf (fewer valid candidates than kk
    after masking) are safe by construction: every element outside the
    partition is also -inf and the callers drop non-finite rows."""
    import numpy as np

    from ripcurrent_spark.operators.similarity import _row_topk_np

    st = np.full((3, 200), -np.inf)
    st[0, 17] = 0.5
    st[1, 3] = 0.9
    st[1, 150] = 0.2
    top, ts = _row_topk_np(st, 6, np)
    assert top.shape == (3, 6)
    assert list(top[0][:1]) == [17] and np.isinf(ts[0][1:]).all()
    assert list(top[1][:2]) == [3, 150] and np.isinf(ts[1][2:]).all()
    assert np.isinf(ts[2]).all()
