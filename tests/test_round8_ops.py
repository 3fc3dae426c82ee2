"""Round-8 tests: ADVICE r7 items (sigstore tmp stranding, ranking
suffixed-clash guard, bpe empty-doc counts, consensus release seam via
the registry-wide sweep in test_cache_hygiene.py) and VERDICT r7 items
(production-vocabulary tokenizer posture, consensus-gated corpus
materialization, perceptual-hash image dedup, post-hoc manifest
stamping)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.queries import all_queries

# ------------------------------------------------------- sigstore tmp GC


def test_sigstore_failed_build_sweeps_own_tmp(spark, tmp_path, monkeypatch):
    """ADVICE r7: a build that dies after partially writing its tmp dir
    must not strand it — the post-success sibling sweep never runs on
    the failure path, and a regenerated source lands a NEW digest name
    that would never glob the old tmp."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_CACHE", str(tmp_path))
    from ripcurrent_spark.operators import sigstore

    out = sigstore.artifact_dir("tkind", "tkey")

    def bad_build():
        tmp = out.parent / f"{out.name}.tmp.{os.getpid()}"
        tmp.mkdir(parents=True)
        (tmp / "part-00000").write_text("half-written junk")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        sigstore.materialized(spark, "tkind", "tkey", bad_build)
    assert not list(out.parent.glob("*.tmp.*")), "failed build stranded its tmp dir"
    assert not (out / "_SUCCESS").exists()


def test_gc_stranded_ages_out_foreign_tmp(tmp_path):
    """A crashed OTHER-process builder's tmp dir (its finally never
    ran) ages out of the cache after an hour; a fresh one is left for
    the in-flight build that owns it."""
    from ripcurrent_spark.operators.sigstore import gc_stranded

    kind = tmp_path / "somekind"
    old = kind / "abcdef.tmp.12345"
    fresh = kind / "abcdef.tmp.67890"
    for d in (old, fresh):
        d.mkdir(parents=True)
        (d / "part-00000").write_text("x")
    os.utime(old, (0, 0))  # epoch: definitely older than an hour

    removed = gc_stranded(root=tmp_path)
    assert str(old) in removed
    assert not old.exists()
    assert fresh.exists()


# ------------------------------------------------- ranking clash guard


def test_multi_rank_rejects_suffixed_internal_clash(spark):
    """ADVICE r7: the generated columns are index-suffixed (_rk_sk0,
    _rk_bucket0, ...); an input column with exactly that name must be
    rejected, not silently duplicated."""
    from ripcurrent_spark.operators.ranking import exact_global_ranks_multi

    df = spark.range(10).select(
        F.col("id"), F.col("id").alias("v"), F.lit(1).alias("_rk_sk0")
    )
    with pytest.raises(ValueError, match="_rk_sk0"):
        exact_global_ranks_multi(df, [([("v", False)], "r")], unique_col="id")
