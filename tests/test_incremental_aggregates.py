"""Incremental per-key aggregates: folding micro-batches equals the
batch recompute, replays are guarded per bucket, and per-trigger I/O
touches only the batch's buckets."""

from __future__ import annotations

import hashlib
from decimal import Decimal
from pathlib import Path

from ripcurrent_spark.streaming.aggregates import (
    incremental_count_sum_foreach_batch,
    read_aggregates,
)

N_BUCKETS = 8
SCHEMA = "k int, v double"


def _state(spark, target):
    return {
        r.k: (r.cnt, Decimal(r.total)) for r in read_aggregates(spark, target).collect()
    }


def test_incremental_fold_equals_batch_recompute(spark, tmp_path):
    target = str(tmp_path / "agg")
    fn = incremental_count_sum_foreach_batch(target, ["k"], "v", n_buckets=N_BUCKETS)
    b0 = [(i % 5, float(i)) for i in range(20)]
    b1 = [(i % 7, float(i) / 2) for i in range(21)]
    fn(spark.createDataFrame(b0, SCHEMA), 0)
    fn(spark.createDataFrame(b1, SCHEMA), 1)

    import collections

    expect = collections.defaultdict(lambda: [0, Decimal(0)])
    for k, v in b0 + b1:
        expect[k][0] += 1
        expect[k][1] += Decimal(str(v))
    got = _state(spark, target)
    assert {k: (c, t) for k, (c, t) in expect.items()} == got

    # avg derives from the partials
    avgs = {r.k: r.avg for r in read_aggregates(spark, target).collect()}
    assert avgs[0] == float(expect[0][1] / expect[0][0])


def test_replayed_batch_is_skipped(spark, tmp_path):
    target = str(tmp_path / "agg")
    fn = incremental_count_sum_foreach_batch(target, ["k"], "v", n_buckets=N_BUCKETS)
    b1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], SCHEMA)
    fn(spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], SCHEMA), 0)
    fn(b1, 1)
    before = _state(spark, target)
    fn(b1, 1)  # at-least-once replay
    assert _state(spark, target) == before


def test_only_touched_buckets_rewritten(spark, tmp_path):
    target = str(tmp_path / "agg")
    fn = incremental_count_sum_foreach_batch(target, ["k"], "v", n_buckets=N_BUCKETS)
    fn(spark.createDataFrame([(i, 1.0) for i in range(32)], SCHEMA), 0)

    def inventory():
        base = Path(target)
        return {
            str(p.relative_to(base)): hashlib.md5(p.read_bytes()).hexdigest()
            for p in base.rglob("*.parquet")
        }

    before = inventory()
    fn(spark.createDataFrame([(1, 5.0)], SCHEMA), 1)
    after = inventory()
    from ripcurrent_spark.sinks import key_bucket

    touched = {
        f"_bucket={r[0]}"
        for r in spark.createDataFrame([(1, 5.0)], SCHEMA)
        .select(key_bucket(["k"], N_BUCKETS).alias("b"))
        .collect()
    }
    changed = {p.split("/")[0] for p in set(before) ^ set(after)} | {
        p.split("/")[0] for p in before if after.get(p) not in (None, before[p])
    }
    assert changed <= touched


def test_incremental_hll_matches_batch_and_replay_idempotent(spark, tmp_path):
    from ripcurrent_spark.queries import all_queries  # noqa: F401  (session parity)
    from ripcurrent_spark.streaming.aggregates import (
        incremental_hll_foreach_batch,
        read_hll_estimates,
    )

    target = str(tmp_path / "hll")
    fn = incremental_hll_foreach_batch(target, "g", "u", n_buckets=4)
    SCHEMA2 = "g string, u long"
    b0 = [("a", i % 37) for i in range(200)] + [("b", i % 11) for i in range(50)]
    b1 = [("a", 1000 + (i % 23)) for i in range(100)] + [("b", i % 11) for i in range(50)]
    fn(spark.createDataFrame(b0, SCHEMA2), 0)
    fn(spark.createDataFrame(b1, SCHEMA2), 1)

    streamed = {
        r.grp: r.hll_estimate for r in read_hll_estimates(spark, target).collect()
    }

    # one-shot batch fold over ALL rows must give identical registers
    batch_target = str(tmp_path / "hll_batch")
    fn2 = incremental_hll_foreach_batch(batch_target, "g", "u", n_buckets=4)
    fn2(spark.createDataFrame(b0 + b1, SCHEMA2), 0)
    batch = {
        r.grp: r.hll_estimate
        for r in read_hll_estimates(spark, batch_target).collect()
    }
    assert streamed == batch
    # sanity: estimates in a sane band around the true distinct counts
    assert abs(streamed["a"] - 60) / 60 < 0.35
    assert abs(streamed["b"] - 11) / 11 < 0.35

    # max-merge is naturally idempotent: an at-least-once replay
    # re-maxes the same rhos, leaving the register STATE identical —
    # no _applied_batch transactional guard needed (contrast with the
    # additive count/sum fold above, which requires one).
    def registers():
        return sorted(
            (r.grp, r.j, r.rho) for r in spark.read.parquet(target).collect()
        )

    before = registers()
    fn(spark.createDataFrame(b1, SCHEMA2), 1)  # at-least-once replay
    assert registers() == before
