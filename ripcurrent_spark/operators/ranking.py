"""Exact distributed global ranking — row_number()/NTILE over frames
that scale with the data, without the single-task sort.

An unpartitioned ``row_number()``/``ntile()`` window funnels EVERY row
through one task (Spark plans ``Exchange SinglePartition`` + one
sort): correct at bench scale, a guaranteed straggler-then-OOM on a
customer- or vocabulary-sized frame at 100 TB. Spark's own global
``orderBy`` solves the identical problem with a RANGE exchange; this
module applies the same decomposition to ranking, with the range
boundaries drawn deterministically so the result is bit-stable and
oracle-checkable:

1. **Boundaries**: a bottom-k sample by the portable md5 priority of a
   row-unique column (``orderBy(h32).limit(k)`` = TakeOrderedAndProject,
   mergeable) is collected (control-plane: ``sample_k`` rows), sorted
   by the rank order, and every (len/n_buckets)-th key tuple becomes a
   cut. Hash-based sampling means the cuts — unlike
   ``repartitionByRange``'s RNG-sampled boundaries — are a pure
   function of the data.
2. **Bucketing**: each row gets ``_bucket`` = number of cuts strictly
   before it in sort order — one struct comparison per cut against an
   ascending-equivalent key struct (map-side, codegen-small, no
   shuffle). Because the sample is uniform in
   RANK space, bucket sizes concentrate near n/n_buckets regardless of
   value skew — the order includes a unique tie-break, so even a
   single hot value splits across cuts.
3. **Local ranks**: ``row_number() OVER (PARTITION BY _bucket)`` — the
   one shuffle, parallel across buckets, each task sorting ~n/B rows.
4. **Offsets**: per-bucket counts, cumulated over the B-row (bounded,
   constant) counts frame, joined back broadcast. Global rank = bucket
   offset + local rank; the grand total rides along for NTILE.

NTILE(t) then needs no second pass: with n = total rows, q = n div t,
r = n mod t, the tile of 1-based rank p is the standard
first-r-tiles-get-q+1 rule — exact integer arithmetic, identical to
the window function's assignment on both engines.

All key columns must be non-null and (keys + tie-break) a total order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ripcurrent_spark.functions.hashing import h32

_BKT, _LR, _OFF, _TOT = "_rk_bucket", "_rk_local", "_rk_off", "_rk_total"


def _order_cols(df: DataFrame, keys: Sequence[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).desc() if desc else F.col(c).asc() for c, desc in keys]


def _asc_equiv(expr: Column, dtype: T.DataType, desc: bool) -> Column:
    """Map ``expr`` to a value whose ASCENDING order equals the
    requested order — so a multi-key comparison collapses to ONE
    struct comparison per cut instead of a lexicographic CASE chain
    (63 cuts of chained compares overflow janino's 64 KB method limit
    and silently drop the whole stage out of codegen)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        v = F.unix_micros(expr.cast("timestamp"))
    elif isinstance(dtype, T.DateType):
        v = F.unix_date(expr)
    elif isinstance(
        dtype,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    ):
        v = expr
    else:
        raise ValueError(
            f"exact_global_ranks: unsupported key type {dtype.simpleString()} "
            "(orderable-invertible types only: numeric, decimal, date, timestamp)"
        )
    return (-v) if desc else v


def _sort_struct(df: DataFrame, keys: Sequence[tuple[str, bool]]) -> Column:
    return F.struct(
        *[
            _asc_equiv(F.col(name), df.schema[name].dataType, desc).alias(f"k{i}")
            for i, (name, desc) in enumerate(keys)
        ]
    )


def _cut_struct(df: DataFrame, keys: Sequence[tuple[str, bool]], cut) -> Column:
    return F.struct(
        *[
            _asc_equiv(
                F.lit(val).cast(df.schema[name].dataType),
                df.schema[name].dataType,
                desc,
            ).alias(f"k{i}")
            for i, ((name, desc), val) in enumerate(zip(keys, cut))
        ]
    )


def exact_global_ranks(
    df: DataFrame,
    keys: Sequence[tuple[str, bool]],
    unique_col: str,
    out_col: str = "rank",
    n_buckets: int = 64,
    sample_k: int = 4096,
    total_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact 1-based global row_number under
    ``keys`` ([(column, descending?), ...] — must include a unique
    tie-break so the order is total), computed with the range-bucketed
    decomposition above instead of a single-task window. With
    ``total_col`` set, the grand total row count rides along (for
    NTILE arithmetic)."""
    clash = {_BKT, _LR, _OFF, _TOT} & set(df.columns)
    if clash:
        raise ValueError(f"input already has internal column(s) {sorted(clash)}")

    import functools

    key_names = [c for c, _ in keys]
    sample = (
        df.select(
            h32(F.col(unique_col).cast("string"), seed="rkb").alias("_rk_pri"),
            *key_names,
        )
        .orderBy("_rk_pri", *key_names)
        .limit(sample_k)
        .collect()
    )

    def _cmp(a, b) -> int:
        for i, (_, desc) in enumerate(keys):
            if a[i] == b[i]:
                continue
            lt = a[i] < b[i]
            return (1 if lt else -1) if desc else (-1 if lt else 1)
        return 0

    srt = sorted([tuple(r)[1:] for r in sample], key=functools.cmp_to_key(_cmp))
    cuts: list[tuple] = []
    for j in range(1, n_buckets):
        if not srt:
            break
        cut = srt[min(len(srt) - 1, (j * len(srt)) // n_buckets)]
        if not cuts or cut != cuts[-1]:
            cuts.append(cut)

    skey = _sort_struct(df, keys)
    bucket = F.lit(0)
    for cut in cuts:
        bucket = bucket + (skey > _cut_struct(df, keys, cut)).cast("int")
    bucketed = df.withColumn(_BKT, bucket)

    local = bucketed.withColumn(
        _LR, F.row_number().over(W.partitionBy(_BKT).orderBy(*_order_cols(df, keys)))
    )
    counts = bucketed.groupBy(_BKT).agg(F.count(F.lit(1)).alias("_rk_n"))
    # Bounded global windows: the counts frame has at most n_buckets
    # rows by construction — constant, not data-scaled.
    woff = W.orderBy(_BKT).rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        _BKT,
        F.coalesce(F.sum("_rk_n").over(woff), F.lit(0)).alias(_OFF),
        F.sum("_rk_n").over(W.partitionBy(F.lit(1))).alias(_TOT),
    )
    out = local.join(F.broadcast(offsets), _BKT).withColumn(
        out_col, (F.col(_OFF) + F.col(_LR)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOT))
    return out.drop(_BKT, _LR, _OFF, _TOT)


def _floordiv(a: Column, b: Column) -> Column:
    """Exact long floor-division for non-negative operands: (a - a%b)
    is exactly divisible by b, so the double division is exact while
    the quotient fits in 2^53 — no float-rounding off-by-one at tile
    boundaries, unlike floor(a/b)."""
    return ((a - a % b) / b).cast("long")


def ntile_expr(rank: Column, total: Column, t: int) -> Column:
    """Exact NTILE(t) from a 1-based global rank and the total row
    count: q = n div t, r = n mod t; the first r tiles take q+1 rows,
    the rest q — the same assignment the window function makes."""
    tl = F.lit(t).cast("long")
    qq = _floordiv(total.cast("long"), tl)
    rr = (total.cast("long") % tl)
    big = rr * (qq + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, _floordiv(rank - 1, qq + 1) + 1)
        .otherwise(rr + _floordiv(rank - big - 1, F.greatest(qq, F.lit(1).cast("long"))) + 1)
        .cast("int")
    )
