"""Mergeable bottom-k (KMV) sample sketches — the distributed first
pass for the quantile family.

Spark's exact ``percentile`` is an imperative aggregate that collects
every value of its group into ONE aggregation buffer; a global (or
5-group) exact percentile over 100 TB is an executor OOM, not a slow
query. The KMV bottom-k sample replaces that first pass with a
mergeable sketch: keep the k rows with the smallest deterministic
md5-derived priorities (``functions/hashing.h32``). Because the
priority is independent of the value, the kept rows are a uniform
k-row sample of the group, and its order statistics estimate any
quantile; because the priorities are portable (identical in DuckDB),
the SAMPLE — and therefore the estimate itself — is bit-identical on
both engines, so the driver's value-hash checks the approximation,
not just its envelope.

Mergeability is the scale story: the bottom-k of a union is the
bottom-k of the merged per-partition bottom-ks.

- **Global** bottom-k is plain ``orderBy(priority).limit(k)`` — Spark
  executes it as TakeOrderedAndProject (per-partition partial top-k;
  only k rows per partition reach the final merge; the corpus is
  never globally sorted). Used by ``q_bottomk_sample_quantiles`` and
  ``q_hist_equidepth``.
- **Per-group** bottom-k (:func:`grouped_bottomk`) needs one more
  trick: a single ``row_number() OVER (PARTITION BY group)`` window
  puts each group's ENTIRE column through one task's sort — with 5
  market segments over 100 TB that is a 20 TB single-task sort. So
  phase 1 shards every group by ``priority % shards`` and takes
  bottom-k per (group, shard) — parallelism groups x shards, each
  task sorting 1/shards of its group (external, spillable); phase 2
  merges the groups x shards x k survivors (tiny) with the plain
  per-group window. Exactness of the merge: with a total-order
  tie-break, the bottom-k set of the union IS the bottom-k of the
  shard bottom-ks, so the two-phase result equals the one-phase
  ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...) <= k`` the DuckDB
  oracle runs.

Reference parity: the reference engine's SortCL aggregations compute
exact per-group statistics in one pass over sorted runs
(/root/reference field-program semantics); this module is the
Spark-native scale path for the same statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SHARD = "_bk_shard"
_RN = "_bk_rn"


def grouped_bottomk(
    df: DataFrame,
    group_cols: Sequence[str],
    priority: Column,
    tiebreak: Sequence[Column | str],
    k: int,
    shards: int = 32,
) -> DataFrame:
    """Bottom-k rows per group by (priority, *tiebreak), two-phase.

    ``priority`` must be a non-negative integral column (the portable
    h32 hash); ``priority % shards`` is the phase-1 salt. The
    (priority, *tiebreak) order must be a TOTAL order within each
    group — otherwise the selected SET can differ between the sharded
    and unsharded plans. Output drops no input columns and adds none.

    ``shards=1`` skips the phase-1 salt window entirely — the right
    form when group sizes are already bounded upstream (e.g. band
    groups under the hot-band cap), where the extra shuffle buys
    nothing.
    """
    clash = {_SHARD, _RN, "_bk_p"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has internal column(s) {sorted(clash)}")
    order: list[Column]
    if shards == 1:
        pri1 = df.withColumn("_bk_p", priority)
        order = [F.col("_bk_p")] + [F.col(c) if isinstance(c, str) else c for c in tiebreak]
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return (
            pri1.withColumn(_RN, F.row_number().over(w))
            .filter(F.col(_RN) <= k)
            .drop(_RN, "_bk_p")
        )
    pri = df.withColumn(_SHARD, priority % F.lit(shards)).withColumn("_bk_p", priority)
    order = [F.col("_bk_p")] + [F.col(c) if isinstance(c, str) else c for c in tiebreak]
    w1 = Window.partitionBy(*group_cols, _SHARD).orderBy(*order)
    survivors = (
        pri.withColumn(_RN, F.row_number().over(w1)).filter(F.col(_RN) <= k).drop(_RN)
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn(_RN, F.row_number().over(w2))
        .filter(F.col(_RN) <= k)
        .drop(_RN, _SHARD, "_bk_p")
    )


def grouped_bottomk_sql(
    source: str,
    group_cols: Sequence[str],
    priority_sql: str,
    tiebreak_sql: Sequence[str],
    k: int,
) -> str:
    """DuckDB mirror of :func:`grouped_bottomk`: the plain one-phase
    ROW_NUMBER form (the two-phase Spark plan selects the same set)."""
    g = ", ".join(group_cols)
    order = ", ".join([priority_sql, *tiebreak_sql])
    return f"""
SELECT * EXCLUDE (_bk_rn) FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {order}) AS _bk_rn
  FROM {source}
) WHERE _bk_rn <= {k}
"""
