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

_BKT, _LR, _OFF, _TOT, _SK = "_rk_bucket", "_rk_local", "_rk_off", "_rk_total", "_rk_sk"


def _order_cols(df: DataFrame, keys: Sequence[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).desc() if desc else F.col(c).asc() for c, desc in keys]


def _asc_equiv(expr: Column, dtype: T.DataType, desc: bool) -> Column:
    """Map ``expr`` to a value whose ASCENDING order equals the
    requested order — so a multi-key comparison collapses to ONE
    struct comparison per cut instead of a lexicographic CASE chain
    (63 cuts of chained compares overflow janino's 64 KB method limit
    and silently drop the whole stage out of codegen).

    Descending keys invert by NEGATION, which has two edge cases the
    naive ``-v`` gets wrong (ADVICE r6): integer ``MIN_VALUE`` wraps
    under non-ANSI negation (``-Long.MIN_VALUE == Long.MIN_VALUE``),
    so integral keys are WIDENED first (int→long, long→decimal(20,0)
    — both lossless, order-preserving, and never at their own MIN);
    and float/double NaN does not invert (``-NaN`` is still NaN,
    which Spark sorts GREATEST in both the original and the negated
    struct), so descending float/double keys are REJECTED rather
    than silently mis-ranked. Ascending float/double keys are fine —
    no negation, and the bucket indicator ``skey > cut`` is monotone
    under Spark's NaN-greatest total order. Decimal negation never
    overflows (decimal ranges are symmetric)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        v, wide = F.unix_micros(expr.cast("timestamp")), "decimal(20,0)"
    elif isinstance(dtype, T.DateType):
        v, wide = F.unix_date(expr), "long"
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        if desc:
            raise ValueError(
                "exact_global_ranks: descending float/double keys are not "
                "supported — NaN does not invert under negation (Spark sorts "
                "NaN greatest in both directions of the negated struct). "
                "Rank ascending, or pre-map to an integral/decimal key."
            )
        return expr
    elif isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        v, wide = expr, "long"
    elif isinstance(dtype, T.LongType):
        v, wide = expr, "decimal(20,0)"
    elif isinstance(dtype, T.DecimalType):
        v, wide = expr, None
    else:
        raise ValueError(
            f"exact_global_ranks: unsupported key type {dtype.simpleString()} "
            "(orderable-invertible types only: numeric, decimal, date, timestamp)"
        )
    if not desc:
        return v
    return -(v.cast(wide)) if wide else (-v)


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


def _asc_sql_type(dtype: T.DataType, desc: bool) -> str:
    """Spark SQL name of _asc_equiv's output type (literal CASTs in
    the generated bucket SQL must match the materialized struct's
    field types exactly, or the struct comparison fails analysis)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "DECIMAL(20,0)" if desc else "BIGINT"
    if isinstance(dtype, T.DateType):
        return "BIGINT" if desc else "INT"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return "BIGINT" if desc else dtype.simpleString().upper()
    if isinstance(dtype, T.LongType):
        return "DECIMAL(20,0)" if desc else "BIGINT"
    if isinstance(dtype, T.DecimalType):
        return dtype.simpleString().upper()
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return dtype.simpleString().upper()
    raise ValueError(f"unsupported key type {dtype.simpleString()}")


def _asc_py_literal(val, dtype: T.DataType, desc: bool) -> str:
    """Driver-side mirror of _asc_equiv on a COLLECTED value: the
    ascending-equivalent literal as a string for the generated SQL."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        delta = val - _dt.datetime(1970, 1, 1, tzinfo=val.tzinfo)
        v = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    elif isinstance(dtype, T.DateType):
        v = (val - _dt.date(1970, 1, 1)).days
    elif isinstance(dtype, T.DecimalType):
        v = _Dec(val)
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        return repr(float(val))  # asc only (desc rejected upstream)
    else:
        v = int(val)
    return str(-v) if desc else str(v)


def _bucket_sql(
    df: DataFrame, keys: Sequence[tuple[str, bool]], cuts, sk_col: str
) -> Column:
    """The bucket index (#cuts strictly below the row's sort key) as
    ONE generated-SQL expression against the materialized key-struct
    column. Building it with per-cut Column operations costs a py4j
    JVM round-trip per node — measured 7.3 s of pure DRIVER time for
    3 x 63 cuts at sf1 (more than the Spark jobs themselves); a
    single F.expr over a driver-built string is one call, and the
    parsed plan (sum of struct comparisons vs literal named_structs)
    is byte-identical to the Column form."""
    if not cuts:
        return F.lit(0)
    terms = []
    for cut in cuts:
        fields = []
        for i, ((name, desc), val) in enumerate(zip(keys, cut)):
            dt = df.schema[name].dataType
            lit = _asc_py_literal(val, dt, desc)
            fields.append(f"'k{i}', CAST('{lit}' AS {_asc_sql_type(dt, desc)})")
        terms.append(
            f"CAST((`{sk_col}` > named_struct({', '.join(fields)})) AS INT)"
        )
    return F.expr("(" + " + ".join(terms) + ")")


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
    clash = {_BKT, _LR, _OFF, _TOT, _SK} & set(df.columns)
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

    # Materialize the ascending-equivalent key struct ONCE per row and
    # compare the materialized COLUMN against each cut literal: inlining
    # the struct constructor into every comparison re-builds it per cut
    # (63 struct allocations/row — measured 2.34 s vs 1.39 s cold at
    # sf1 on the 150k customer aggregate; CollapseProject keeps the
    # separate projection because the non-cheap expr is referenced >1x).
    mat = df.select("*", _sort_struct(df, keys).alias(_SK))
    bucketed = mat.select(*df.columns, _bucket_sql(df, keys, cuts, _SK).alias(_BKT))

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


def exact_global_ranks_multi(
    df: DataFrame,
    specs: Sequence[tuple[Sequence[tuple[str, bool]], str]],
    unique_col: str,
    n_buckets: int = 64,
    sample_k: int = 4096,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global row_numbers under SEVERAL key orders over the SAME
    frame in one fused pass — ``specs`` is [(keys, out_col), ...] with
    each ``keys`` as in :func:`exact_global_ranks`.

    The single-order operator pays one boundary-sample collect, one
    bucket-count aggregation, and one broadcast offsets join PER
    ORDER; a consumer ranking the same frame three ways (RFM is the
    canonical case) triples all of it and then joins three scored
    frames back on the key — three fact-fact shuffles (r6 measured
    the total at 12.6 s on a frame whose work is ~1 s). Fused form:

    1. ONE sample collect projects the union of all key columns; each
       spec's cuts are sorted from that one sample driver-side.
    2. All bucket columns land in one map-side projection.
    3. Bucket counts for EVERY spec come from one fused cache-warm
       posexplode collect (≤ specs x n_buckets rows), and the
       per-bucket offsets are embedded as LITERAL arrays indexed by
       the bucket column — no offsets join at all, and rank columns
       attach IN PLACE, so the three score joins disappear entirely.
    4. The input is persisted only around the control-plane collects
       and unpersisted before returning (the r6 ADVICE cache-leak
       class) — the returned plan re-derives the input lineage exactly
       once at action time.

    The rank columns are bit-identical to chained single-order calls
    (same cuts-from-hash-sample determinism, same bucket indicator,
    same window)."""
    names = [out for _, out in specs]
    # The generated columns are INDEX-SUFFIXED (_rk_sk0, _rk_bucket1,
    # ...), so the clash set must contain the actual suffixed names —
    # the bare prefixes alone let an input column named e.g. _rk_sk0
    # slip through and produce a duplicate column (ADVICE r7).
    suffixed = {f"{p}{si}" for p in (_SK, _BKT) for si in range(len(specs))}
    clash = (
        {_BKT, _LR, _OFF, _TOT, _SK, "_rk_spec", "_rk_b"} | suffixed | set(names)
    ) & set(df.columns)
    if clash:
        raise ValueError(f"input already has internal column(s) {sorted(clash)}")

    import functools

    all_keys: list[str] = []
    for keys, _ in specs:
        for c, _d in keys:
            if c not in all_keys:
                all_keys.append(c)

    df = df.persist()
    try:
        sample = (
            df.select(
                h32(F.col(unique_col).cast("string"), seed="rkb").alias("_rk_pri"),
                *all_keys,
            )
            .orderBy("_rk_pri", *all_keys)
            .limit(sample_k)
            .collect()
        )
        col_pos = {c: i for i, c in enumerate(all_keys)}

        # Materialize every spec's ascending-equivalent key struct ONCE
        # per row, then compare the materialized COLUMNS against the cut
        # literals — inlining the struct constructor into each of the
        # ~63 comparisons re-allocates it per cut (measured 2.34 s vs
        # 1.39 s per count job at sf1; see exact_global_ranks).
        mat = df.select(
            "*",
            *[
                _sort_struct(df, keys).alias(f"{_SK}{si}")
                for si, (keys, _) in enumerate(specs)
            ],
        )
        bucket_cols = []
        for si, (keys, _) in enumerate(specs):
            idx = [col_pos[c] for c, _d in keys]

            def _cmp(a, b, keys=keys, idx=idx) -> int:
                for j, (_, desc) in enumerate(keys):
                    av, bv = a[idx[j]], b[idx[j]]
                    if av == bv:
                        continue
                    lt = av < bv
                    return (1 if lt else -1) if desc else (-1 if lt else 1)
                return 0

            srt = sorted([tuple(r)[1:] for r in sample], key=functools.cmp_to_key(_cmp))
            cuts: list[tuple] = []
            for j in range(1, n_buckets):
                if not srt:
                    break
                cut_row = srt[min(len(srt) - 1, (j * len(srt)) // n_buckets)]
                cut = tuple(cut_row[k] for k in idx)
                if not cuts or cut != cuts[-1]:
                    cuts.append(cut)
            bucket_cols.append(
                _bucket_sql(df, keys, cuts, f"{_SK}{si}").alias(f"{_BKT}{si}")
            )

        bucketed = mat.select(*df.columns, *bucket_cols)

        # Control-plane: ALL specs' bucket counts in ONE fused job
        # (posexplode over the bucket columns) — three separate count
        # jobs each pay their own codegen compile of a 63-cut
        # projection (~2 s apiece at sf1); fused, the projection
        # compiles once and the cache scans once.
        cnt: dict[tuple[int, int], int] = {
            (r[0], r[1]): r[2]
            for r in bucketed.select(
                F.posexplode(
                    F.array(*[F.col(f"{_BKT}{si}") for si in range(len(specs))])
                ).alias("_rk_spec", "_rk_b")
            )
            .groupBy("_rk_spec", "_rk_b")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(n for (si, _b), n in cnt.items() if si == 0)
        offsets: list[list[int]] = []
        for si in range(len(specs)):
            per = {b: n for (s, b), n in cnt.items() if s == si}
            run, offs = 0, []
            for b in range(max(per, default=-1) + 2):
                offs.append(run)
                run += per.get(b, 0)
            offsets.append(offs)
    finally:
        df.unpersist()

    out = bucketed
    for si, ((keys, out_col), offs) in enumerate(zip(specs, offsets)):
        bkt = F.col(f"{_BKT}{si}")
        lr = F.row_number().over(
            W.partitionBy(f"{_BKT}{si}").orderBy(*_order_cols(out, keys))
        )
        off = F.element_at(F.array(*[F.lit(o).cast("long") for o in offs]), bkt + 1)
        out = out.withColumn(out_col, (off + lr).cast("long"))
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out.drop(*[f"{_BKT}{si}" for si in range(len(specs))])


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
