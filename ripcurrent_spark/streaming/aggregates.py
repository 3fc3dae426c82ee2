"""Incremental aggregate maintenance (materialized-view pattern).

A 100 TB pipeline cannot recompute `SELECT key, count(*), sum(x)`
from scratch per trigger; it maintains MERGEABLE per-key partials and
folds each micro-batch in: state' = state ⊕ partial(batch). Count and
sum are the canonical mergeable pair (avg derives; min/max merge the
same way).

Exactly-once on an at-least-once channel: additive folds are NOT
naturally idempotent, so each state bucket records the highest batch
id folded into it (`_applied_batch`). A replayed batch (foreachBatch
re-runs after failures) is skipped for buckets that already recorded
it — the same transactional-version guard a Delta `txnVersion` write
provides, expressed on plain bucket-partitioned parquet. Buckets the
failed attempt never wrote still fold the replay normally, healing
partial failures.

I/O per trigger follows the merge-sink discipline: only buckets
containing batch keys are read and rewritten.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.sinks import has_bucketed_data, key_bucket, overwrite_buckets


def incremental_count_sum_foreach_batch(
    target_dir: str,
    key_cols: Sequence[str],
    value_col: str,
    n_buckets: int = 16,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fn maintaining per-key (cnt, total) partials.
    `total` accumulates in DECIMAL(38,6) so the fold is exact and
    order/replay-schedule-independent."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        target = Path(target_dir)
        partial = (
            batch.withColumn("_bucket", key_bucket(key_cols, n_buckets))
            .groupBy("_bucket", *key_cols)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col(value_col).cast("decimal(38,6)")).alias("total"),
            )
        )
        touched = sorted(r[0] for r in partial.select("_bucket").distinct().collect())
        if not touched:
            return
        if has_bucketed_data(target):
            state = spark.read.parquet(str(target)).filter(
                F.col("_bucket").isin(touched)
            )
            bucket_stamp = {
                r["_bucket"]: r["m"]
                for r in state.groupBy("_bucket")
                .agg(F.max("_applied_batch").alias("m"))
                .collect()
            }
            # Transactional guard: a bucket that already folded this
            # batch id (we are a replay) must not fold it again.
            applied = [b for b, m in bucket_stamp.items() if m is not None and m >= batch_id]
            fold = partial.filter(~F.col("_bucket").isin(applied)) if applied else partial
            merged = (
                state.drop("_applied_batch")
                .unionByName(fold)
                .groupBy("_bucket", *key_cols)
                .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
            )
            # New stamp per bucket: never move backwards (replaying an
            # old batch must not lower the guard below a newer one).
            stamp = F.create_map(
                *[
                    F.lit(x)
                    for b in touched
                    for x in (b, max(batch_id, bucket_stamp.get(b) or batch_id))
                ]
            )
            merged = merged.withColumn("_applied_batch", stamp[F.col("_bucket")])
        else:
            merged = partial.withColumn("_applied_batch", F.lit(batch_id))
        overwrite_buckets(merged, target, ("_bucket",))

    return _apply


def read_aggregates(spark, target_dir: str) -> DataFrame:
    """Current materialized per-key aggregates (adds derived avg)."""
    s = spark.read.parquet(str(target_dir)).drop("_applied_batch", "_bucket")
    # Cast to DOUBLE before dividing: Spark's decimal/long division
    # truncates to the result type's scale first.
    return s.withColumn("avg", F.col("total").cast("double") / F.col("cnt"))


def incremental_hll_foreach_batch(
    target_dir: str,
    group_col: str,
    value_col: str,
    n_buckets: int = 8,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fn maintaining per-group HyperLogLog registers
    (the streaming twin of q_hll_distinct_users): state is
    (group, register j, max rho), merged per trigger by MAX.

    Unlike the additive count/sum fold above, max-merge is NATURALLY
    IDEMPOTENT — replaying a batch re-maxes the same rhos and the
    register STATE is unchanged, so this path needs no _applied_batch
    transactional guard (documented contrast; the test replays a batch
    and asserts the register table is identical). I/O per trigger:
    only buckets containing the batch's groups are read/rewritten, and
    each group collapses to <= 64 register rows regardless of traffic
    volume.
    """
    from ripcurrent_spark.functions.hashing import h32

    RHO_BITS = 26
    two_r = 2 ** RHO_BITS

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        target = Path(target_dir)
        hv = h32(F.col(value_col).cast("string"), seed="hll")
        w = hv % two_r
        rho = F.when(w == 0, F.lit(RHO_BITS + 1)).otherwise(
            F.lit(RHO_BITS + 1) - F.length(F.bin(w))
        )
        partial = (
            batch.select(
                F.col(group_col).alias("grp"),
                (hv / two_r).cast("long").alias("j"),
                rho.alias("rho"),
            )
            .groupBy("grp", "j")
            .agg(F.max("rho").alias("rho"))
            .withColumn("_bucket", key_bucket(["grp"], n_buckets))
        )
        touched = sorted(r[0] for r in partial.select("_bucket").distinct().collect())
        if not touched:
            return
        if has_bucketed_data(target):
            state = spark.read.parquet(str(target)).filter(
                F.col("_bucket").isin(touched)
            )
            merged = (
                state.unionByName(partial)
                .groupBy("_bucket", "grp", "j")
                .agg(F.max("rho").alias("rho"))
            )
        else:
            merged = partial.select("_bucket", "grp", "j", "rho")
        # One partition per bucket keeps each register file small and
        # the rewrite cost proportional to touched groups.
        merged = merged.repartition("_bucket")
        overwrite_buckets(merged, target, ("_bucket",))

    return _apply


def read_hll_estimates(spark, target_dir: str) -> DataFrame:
    """Distinct-count estimates from the materialized registers —
    identical arithmetic to q_hll_distinct_users (integer 2^(27-M)
    weights, alpha_64, small-range linear counting)."""
    M = 64
    RHO_BITS = 26
    s = spark.read.parquet(str(target_dir))
    z = s.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), F.lit(RHO_BITS + 1) - F.col("rho")).cast("long")).alias(
            "z_active"
        ),
        F.count("*").alias("n_active"),
    )
    zprime = F.col("z_active") + (M - F.col("n_active")) * (2 ** (RHO_BITS + 1))
    alpha = 0.7213 / (1.0 + 1.079 / 64)
    raw = F.lit(alpha) * M * M * float(2 ** (RHO_BITS + 1)) / zprime
    n_empty = (F.lit(M) - F.col("n_active")).cast("int")
    est = F.when(
        (raw <= 2.5 * M) & (n_empty > 0), M * F.log(float(M) / n_empty)
    ).otherwise(raw)
    return z.select(
        "grp", n_empty.alias("n_empty_registers"), F.round(est, 6).alias("hll_estimate")
    )
