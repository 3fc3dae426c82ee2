"""Deterministic sampling / splitting for training-data pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed- and
partitioning-dependent, which breaks both reproducibility across
cluster sizes and oracle checking. These operators instead derive the
sampling decision from a portable content hash (`h32`, md5-based), so:

- a row's sample/split assignment is a pure function of its key —
  stable under repartitioning, retries, and engine choice;
- train/val/test splits are disjoint and exhaustive by construction;
- at 100 TB the filter is a codegen'd scan predicate (no shuffle,
  no state, embarrassingly parallel).

Mirrors the scale posture of the reference engine's set-based row
selection (/root/reference/src/main/java/RulesLibrary.java:30-58 uses
static set files for row-value decisions for the same reason:
determinism over randomness).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32, h32_sql


def hash_pct(key: Column | str, salt: str = "sample") -> Column:
    """Deterministic percentile bucket in [0, 100) for a key column."""
    c = F.col(key) if isinstance(key, str) else key
    return h32(c.cast("string"), seed=salt) % 100


def hash_pct_sql(expr: str, salt: str = "sample") -> str:
    return f"{h32_sql(f'CAST({expr} AS VARCHAR)', seed=salt)} % 100"


def hash_sample(key: Column | str, pct: int, salt: str = "sample") -> Column:
    """Boolean predicate keeping ~pct% of rows, deterministically."""
    return hash_pct(key, salt) < pct


def split_label(
    key: Column | str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> Column:
    """'train' / 'val' / 'test' label — disjoint, exhaustive, stable."""
    b = hash_pct(key, salt)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_label_sql(expr: str, train_pct: int = 80, val_pct: int = 10, salt: str = "split") -> str:
    b = hash_pct_sql(expr, salt)
    return (
        f"CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' ELSE 'test' END"
    )


def stratified_sample(
    key: Column | str,
    stratum: Column | str,
    rates: dict[str, int],
    default_pct: int = 0,
    salt: str = "strat",
) -> Column:
    """Per-stratum deterministic sampling predicate.

    `rates` maps stratum value -> keep percentage. The scalable twin of
    ``df.sampleBy``: no RNG, no driver-side fraction map distribution —
    just a codegen'd CASE over the stratum column.
    """
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    pct = F.lit(default_pct)
    for value, p in sorted(rates.items()):
        pct = F.when(s == value, F.lit(p)).otherwise(pct)
    return hash_pct(key, salt) < pct


def stratified_sample_sql(
    expr: str, stratum_expr: str, rates: dict[str, int], default_pct: int = 0, salt: str = "strat"
) -> str:
    # Build the CASE innermost-first to mirror the Column fold above.
    pct = str(default_pct)
    for value, p in sorted(rates.items()):
        pct = f"CASE WHEN {stratum_expr} = '{value}' THEN {p} ELSE {pct} END"
    return f"{hash_pct_sql(expr, salt)} < ({pct})"


def temperature_mix_plan(
    counts: list[tuple[str, int]], temperature: float, target_frac: float
) -> list[tuple[str, int, float, float, int]]:
    """Per-source (source, n_docs, mix_weight, accept_rate, h32_threshold)
    for temperature-scaled source mixing at ANY temperature — the
    control-plane companion to the T=2 registered query
    (queries/pipeline.sample_temperature_sources, which keeps the whole
    chain in-plan because sqrt is IEEE-exact cross-engine for the
    oracle). General p^(1/T) goes through libm pow, whose last ulp can
    differ across engines, so arbitrary T computes the thresholds HERE,
    on the driver, over the collected per-source counts — #sources
    rows, the same control-plane discipline as k-means centroids and
    the char-LM lookup table — and ships them as a broadcast literal
    frame. Deterministic given (counts, T): one machine, one libm.
    """
    import math

    n_total = sum(n for _, n in counts)
    w = {s: math.pow(n / n_total, 1.0 / temperature) for s, n in counts}
    z = math.fsum(sorted(w.values()))  # order-pinned exact sum
    out = []
    for s, n in counts:
        q = w[s] / z
        r = min(1.0, q * (target_frac * n_total) / n)
        out.append((s, n, q, r, int(math.floor(r * 4294967296))))
    return out


def temperature_mix(
    docs,  # DataFrame
    source_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 2.0,
    target_frac: float = 0.25,
    salt: str = "tmix",
):
    """Temperature-rebalanced deterministic sample of ``docs`` at any
    T: collect per-source counts (control-plane), compute thresholds
    via :func:`temperature_mix_plan`, broadcast-join them back, and
    accept rows with the hash predicate h32(id) < threshold — two
    corpus scans, no data-scaled shuffle, stable under
    repartitioning/retries. Returns the accepted rows."""
    from pyspark.sql import functions as F

    cnt = [
        (r[0], r[1])
        for r in docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    plan = temperature_mix_plan(cnt, temperature, target_frac)
    spark = docs.sparkSession
    thr = spark.createDataFrame(
        [(s, t) for s, _, _, _, t in plan], f"{source_col} string, _h_thr long"
    )
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        docs.join(F.broadcast(thr), source_col)
        .filter(h32(c.cast("string"), seed=salt) < F.col("_h_thr"))
        .drop("_h_thr")
    )
