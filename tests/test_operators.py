"""Operator semantics on PLANTED cases (constructed inputs with known
answers) — complementary to the DuckDB-oracle parity gate, which
checks engine agreement but not intent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.operators import dedup as DD
from ripcurrent_spark.operators import similarity as SIM
from ripcurrent_spark.operators.intervals import range_join_backward
from ripcurrent_spark.operators.sampling import hash_pct, split_label


# --- dedup -------------------------------------------------------------

def test_exact_dedup_groups_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "different text")],
        "doc_id long, text string",
    )
    got = {
        r.keep_id: r.n_docs
        for r in DD.exact_dedup_groups(df, "doc_id", "text").collect()
    }
    assert got == {1: 2, 3: 1}  # punctuation/case/whitespace-insensitive


def test_minhash_identical_docs_share_all_bands(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a completely unrelated sentence about spark plans")],
        "doc_id long, text string",
    )
    g = df.select("doc_id", DD.tokens("text").alias("toks")).select(
        "doc_id", DD.ngrams_of_tokens(F.col("toks")).alias("ngs")
    )
    sigs = g.select("doc_id", DD.minhash_sig(F.col("ngs")).alias("sig"))
    rows = {r.doc_id: r.sig for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_simhash_near_identical_low_hamming(spark):
    base = "spark catalyst optimizer rewrites logical plans into physical plans"
    df = spark.createDataFrame(
        [(1, base), (2, base + " quickly"), (3, "entirely different words here")],
        "doc_id long, text string",
    )
    t = (
        df.select("doc_id", DD.tokens("text").alias("toks"))
        .select("doc_id", DD.token_hashes(F.col("toks")).alias("hs"))
        .select("doc_id", DD.simhash_votes(F.col("hs"), 32).alias("votes"))
        .select("doc_id", DD.simhash_from_votes(F.col("votes"), 32).alias("sh"))
    )
    sh = {r.doc_id: r.sh for r in t.collect()}
    near = bin(sh[1] ^ sh[2]).count("1")
    far = bin(sh[1] ^ sh[3]).count("1")
    assert near < far
    assert near <= 6


# --- similarity --------------------------------------------------------

def test_brute_force_topk_finds_planted_neighbor(spark):
    # vec 100 is (almost) a copy of vec 0; vec 2 is orthogonal.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (100, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.9, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    q = df.filter(F.col("vec_id") == 0)
    got = SIM.brute_force_topk_np(q, df, k=2).collect()
    # vec 2 and vec 3 are both orthogonal to the query (cosine 0);
    # the tie breaks on neighbor_id.
    assert [r.neighbor_id for r in got] == [100, 2]
    assert got[0].cosine > 0.999


def test_lsh_weights_deterministic_and_signature_buckets(spark):
    assert SIM.lsh_weights(2, 4) == SIM.lsh_weights(2, 4)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.99, 0.01, 0.0, 0.0]), (2, [-1.0, 0.0, 0.0, 0.0])],
        "vec_id long, emb array<double>",
    )
    sig = df.select("vec_id", SIM.lsh_signature(F.col("emb"), 8, dim=4).alias("b"))
    b = {r.vec_id: r.b for r in sig.collect()}
    assert b[0] == b[1]  # same direction -> same bucket
    assert b[0] != b[2]  # opposite direction -> different bucket


# --- sampling ----------------------------------------------------------

def test_split_label_disjoint_exhaustive_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    lab = df.select(
        "doc_id", split_label("doc_id").alias("s"), hash_pct("doc_id", salt="split").alias("p")
    )
    rows = lab.collect()
    counts = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        counts[r.s] += 1
        expected = "train" if r.p < 80 else ("val" if r.p < 90 else "test")
        assert r.s == expected
    assert sum(counts.values()) == 1000
    assert 700 < counts["train"] < 900  # ~80%
    # stability: a repartitioned run assigns identically
    again = {r.doc_id: r.s for r in df.repartition(7).select(
        "doc_id", split_label("doc_id").alias("s")).collect()}
    assert all(again[r.doc_id] == r.s for r in rows)


# --- range join --------------------------------------------------------

def test_range_join_backward_window_semantics(spark):
    from datetime import datetime

    def t(m):
        return datetime(2024, 1, 1, 0, m, 0)

    left = spark.createDataFrame(
        [(1, 100, t(40)), (2, 200, t(10))], "user_id long, pid long, p_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 11, t(15)),  # 25 min before pid=100 -> match
            (1, 12, t(39)),  # 1 min before -> match
            (1, 13, t(9)),   # 31 min before -> NO (window 30m)
            (1, 14, t(41)),  # after -> NO
            (2, 21, t(10)),  # same instant -> match (inclusive)
        ],
        "user_id long, cid long, c_ts timestamp",
    )
    got = range_join_backward(left, right, "user_id", "p_ts", "c_ts", 1800)
    pairs = sorted((r.pid, r.cid) for r in got.collect())
    assert pairs == [(100, 11), (100, 12), (200, 21)]


# --- applyInPandas EWMA ------------------------------------------------

def test_ewma_per_key_fold(spark):
    from datetime import datetime

    from ripcurrent_spark.operators.text import ewma_per_key

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 10.0),
        (1, datetime(2024, 1, 1, 0, 1), 20.0),
        (1, datetime(2024, 1, 1, 0, 2), 30.0),
        (2, datetime(2024, 1, 1, 0, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.ts.minute): r.ewma
        for r in ewma_per_key(df, "user_id", "ts", "value", alpha=0.5).collect()
    }
    # adjust=False: e0 = v0; e_t = 0.5*v_t + 0.5*e_{t-1}
    assert got[(1, 0)] == 10.0
    assert got[(1, 1)] == 15.0
    assert got[(1, 2)] == 22.5
    assert got[(2, 0)] == 5.0


def test_ewma_per_key_string_key_and_int_value(spark):
    """Output schema derives from the caller's actual types — a string
    key / integer value must not hit a hardcoded 'long/double' cast."""
    from datetime import datetime

    from ripcurrent_spark.operators.text import ewma_per_key

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 10), ("a", datetime(2024, 1, 2), 20)],
        "k string, ts timestamp, v int",
    )
    out = ewma_per_key(df, "k", "ts", "v", alpha=0.5)
    assert dict(out.dtypes) == {"k": "string", "ts": "timestamp", "v": "int", "ewma": "double"}
    got = sorted((r.k, r.v, r.ewma) for r in out.collect())
    assert got == [("a", 10, 10.0), ("a", 20, 15.0)]


def test_lsh_signature_rejects_dim_mismatch(spark):
    """A wrong-length embedding must raise, not silently collapse every
    vector into bucket 0 (NULL-padded zip_with zeroes the projections)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, emb array<double>")
    with pytest.raises(SparkRuntimeException, match="lsh_signature"):
        df.select(SIM.lsh_signature(F.col("emb"), 4, dim=3).alias("b")).collect()


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    from ripcurrent_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 10)], "k long, rid long")
    dim = spark.createDataFrame([(1, "x")], "dk long, name string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(fact, dim, "k", "dk", "rid", n_salt=4, how=how)
    # inner/left still work and equal the plain join
    got = salted_join(fact, dim, "k", "dk", "rid", n_salt=4, how="left").collect()
    assert [(r.k, r.name) for r in got] == [(1, "x")]


# --- exact distributed ranking ----------------------------------------

def _rank_fixture(spark):
    # Skewed: one hot value (7) repeated 60x, plus a uniform tail and
    # negative ids — ties MUST split across buckets via the unique
    # tie-break.
    rows = [(i, 7) for i in range(60)] + [(100 + i, i % 13) for i in range(40)]
    return spark.createDataFrame(rows, "id long, v long")


def test_exact_global_ranks_matches_window(spark):
    from pyspark.sql import Window as W

    from ripcurrent_spark.operators.ranking import exact_global_ranks

    df = _rank_fixture(spark)
    got = exact_global_ranks(
        df, [("v", True), ("id", False)], unique_col="id",
        out_col="rk", n_buckets=8, sample_k=32,
    )
    want = df.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("v"), "id"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_exact_global_ranks_no_single_partition_exchange(spark):
    from ripcurrent_spark.operators.ranking import exact_global_ranks

    df = _rank_fixture(spark)
    got = exact_global_ranks(
        df, [("v", True), ("id", False)], unique_col="id",
        out_col="rk", n_buckets=8, sample_k=32,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # The data-sized window is partitioned by bucket; the only global
    # window runs over the <= n_buckets-row counts frame, whose input
    # is an aggregate, never the data frame. Assert the data window is
    # partitioned: every Sort above row_number carries _rk_bucket.
    assert "row_number" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "row_number" in line:
            assert "_rk_bucket" in line


def test_ntile_expr_matches_window_all_sizes(spark):
    from pyspark.sql import Window as W

    from ripcurrent_spark.operators.ranking import exact_global_ranks, ntile_expr

    for n in (1, 2, 3, 4, 5, 7, 8, 100):
        df = spark.createDataFrame([(i, i * 37 % n) for i in range(n)], "id long, v long")
        got = exact_global_ranks(
            df, [("v", True), ("id", False)], unique_col="id",
            out_col="rk", n_buckets=4, sample_k=16, total_col="tot",
        ).select("id", ntile_expr(F.col("rk"), F.col("tot"), 4).alias("t"))
        want = df.select(
            "id", F.ntile(4).over(W.orderBy(F.desc("v"), "id")).alias("t")
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), n


def test_drop_hot_keys_null_group_contract(spark):
    # 3 NULL-key rows (sub-cap at cap=3, hot at cap=2), 4 'a' rows.
    rows = [(i, None) for i in range(3)] + [(10 + i, "a") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, k string")
    # Default: NULLs always dropped, 'a' dropped when over cap.
    got = DD.drop_hot_keys(df, ["k"], cap=3)
    assert {r.id for r in got.collect()} == set()  # nulls gone, 'a' (4>3) gone
    got = DD.drop_hot_keys(df, ["k"], cap=4)
    assert {r.id for r in got.collect()} == {10, 11, 12, 13}
    # Window-mirror semantics: sub-cap NULL group KEPT...
    got = DD.drop_hot_keys(df, ["k"], cap=3, drop_null_keys=False)
    assert {r.id for r in got.collect()} == {0, 1, 2}
    # ...and a hot NULL group capped like any other.
    got = DD.drop_hot_keys(df, ["k"], cap=2, drop_null_keys=False)
    assert {r.id for r in got.collect()} == set()


def test_sigstore_builds_once_and_invalidates_on_mtime(spark, tmp_path, monkeypatch):
    import os
    import shutil

    from ripcurrent_spark.operators import sigstore

    # Point the cache at a temp root and build against sf0.001 data.
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_CACHE", str(tmp_path / "cache"))
    sf = "/root/testdata/sf0.001"
    first = sigstore.minhash_signature_table(spark, sf)
    n = first.count()
    assert n > 0 and set(first.columns) == {"doc_id", "ngs", "sig"}
    # Second call must be a pure read: poison the compute path.
    import ripcurrent_spark.operators.dedup as DD

    def boom(*a, **k):
        raise AssertionError("recompute on a fresh artifact")

    monkeypatch.setattr(DD, "minhash_table_np", boom)
    again = sigstore.minhash_signature_table(spark, sf)
    assert again.count() == n
    # A different source path/mtime invalidates the digest -> a
    # rebuild is attempted, which the poisoned compute path proves.
    src = tmp_path / "sf"
    src.mkdir()
    shutil.copy(f"{sf}/documents.parquet", src / "documents.parquet")
    os.utime(src / "documents.parquet")
    with pytest.raises(AssertionError, match="recompute"):
        sigstore.minhash_signature_table(spark, str(src))
