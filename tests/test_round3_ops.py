"""Unit semantics for round-3 operators, against hand-computed or
textbook references (the oracle gate proves Spark==DuckDB; these prove
both match the INTENDED math)."""

from __future__ import annotations

import hashlib


def _luhn_ref(card: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(card)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_fold_matches_reference(spark):
    from pyspark.sql import functions as F

    # 4532015112830366 is the textbook valid Luhn example; flipping the
    # last digit must invalidate it.
    cards = ["4532015112830366", "4532015112830367", "1234567812345670"]
    df = spark.createDataFrame([(c,) for c in cards], "card string")
    rev = F.reverse(F.col("card"))
    total = F.lit(0)
    for j in range(16):
        d = F.substring(rev, j + 1, 1).cast("int")
        term = d if j % 2 == 0 else F.when(2 * d > 9, 2 * d - 9).otherwise(2 * d)
        total = total + term
    got = {
        r.card: r.valid
        for r in df.select("card", (total % 10 == 0).alias("valid")).collect()
    }
    assert got == {c: _luhn_ref(c) for c in cards}
    assert got["4532015112830366"] is True and got["4532015112830367"] is False


def test_pagerank_fixed_point_matches_hand_computation(spark):
    """Triangle 1-2-3 plus pendant 4-1 (symmetric edges), one
    iteration, hand-computed in exact integer arithmetic."""
    from ripcurrent_spark.queries.graph import N_ITER, SCALE, TELEPORT  # noqa: F401
    from pyspark.sql import functions as F

    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (1, 4), (4, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    deg = {1: 3, 2: 2, 3: 2, 4: 1}

    # replicate graph_pagerank's update rule for 1 iteration in python
    r = {n: SCALE for n in deg}
    for _ in range(1):
        s = {n: 0 for n in deg}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {n: TELEPORT + 85 * (s[n] // 100) for n in deg}

    dege = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = dege.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank"))
    contrib = (
        e.join(ranks, e.src == ranks.node)
        .join(dege.withColumnRenamed("src", "dsrc"), e.src == F.col("dsrc"))
        .select("dst", F.expr("rank div outdeg").alias("c"))
    )
    sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
    nodes = dege.select(F.col("src").alias("node"))
    got = {
        row.node: row.rank
        for row in nodes.join(sums, nodes.node == sums.dst, "left")
        .select(
            "node",
            (F.lit(TELEPORT) + 85 * F.expr("coalesce(s, CAST(0 AS BIGINT)) div 100"))
            .cast("long")
            .alias("rank"),
        )
        .collect()
    }
    assert got == r
    # pendant node 4 must rank below the triangle members
    assert got[4] < min(got[1], got[2], got[3])


def test_bloom_has_no_false_negatives(spark):
    """Every key folded into the filter must probe positive — the
    one-sided guarantee. Recomputed in pure python from the same md5
    positions the engines use."""
    from ripcurrent_spark.queries.search import _BLOOM_BITS, _BLOOM_K, _BLOOM_WORD

    keys = [f"Customer#{i:09d}" for i in range(1, 200)]
    words: dict[int, int] = {}
    for key in keys:
        for j in range(_BLOOM_K):
            pos = int(hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:8], 16) % _BLOOM_BITS
            words[pos // _BLOOM_WORD] = words.get(pos // _BLOOM_WORD, 0) | (
                1 << (pos % _BLOOM_WORD)
            )
    for key in keys:
        for j in range(_BLOOM_K):
            pos = int(hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:8], 16) % _BLOOM_BITS
            assert words.get(pos // _BLOOM_WORD, 0) & (1 << (pos % _BLOOM_WORD)), key


def test_hll_estimate_within_error_bound(spark):
    """HLL with m=64 has relative standard error 1.04/sqrt(64) = 13%;
    the estimate over planted distinct counts must sit within ~3
    sigma. Built through the actual streaming fold."""
    from ripcurrent_spark.streaming.aggregates import (
        incremental_hll_foreach_batch,
        read_hll_estimates,
    )
    import tempfile

    target = tempfile.mkdtemp() + "/hll"
    fn = incremental_hll_foreach_batch(target, "g", "u", n_buckets=2)
    rows = [("x", i) for i in range(2000)] + [("y", i % 100) for i in range(1000)]
    fn(spark.createDataFrame(rows, "g string, u long"), 0)
    est = {r.grp: r.hll_estimate for r in read_hll_estimates(spark, target).collect()}
    assert abs(est["x"] - 2000) / 2000 < 0.4
    assert abs(est["y"] - 100) / 100 < 0.4
