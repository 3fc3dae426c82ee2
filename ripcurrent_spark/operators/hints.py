"""Size-gated broadcast hints.

A literal ``F.broadcast()`` hint overrides AQE and
``spark.sql.autoBroadcastJoinThreshold`` unconditionally. That is the
right call for fixed-cardinality dims (nation is 25 rows at every
scale factor), but on a relation whose row count scales with the data
it is a time bomb: TPC-H customer/supplier/part grow linearly with SF,
so at the ~100 TB design point (≈ sf100k) a hard-coded hint ships a
multi-TB table to every executor — driver OOM or Spark's 8 GB
broadcast-relation hard limit, unconditionally, because the hint
cannot be overridden by config at deploy time.

``bcast`` keeps the hint *conditional on Catalyst's own size
estimate*: computing ``optimizedPlan().stats().sizeInBytes`` triggers
analysis/optimization only — never a Spark job — and for file sources
it derives from the scan's file footprint scaled by column pruning,
i.e. it grows with SF exactly like the danger does. Under the gate the
plan broadcasts exactly as a literal hint would; over the gate the
frame is returned unhinted and AQE / the autoBroadcast threshold
choose among broadcast, shuffle-hash, and sort-merge at runtime (with
runtime size facts, which beat any static guess).

For frames derived through *joins*, the basic stats visitor multiplies
child sizes (a cartesian upper bound — uselessly pessimistic for an
equi-join of two small inputs), so such call sites pass
``gauge=<base table>``: a frame whose own size soundly bounds the
candidate (e.g. the supplier scan for a region-filtered supplier key
set — the filtered set can only be smaller).

The gate is deliberately conservative (256 MB default, configurable
via ``spark.ripcurrent.broadcastGateBytes``): well above bench-scale
dims, well below anything that threatens executor memory on a
reasonably provisioned cluster. Setting it to ``0`` disables every
gated hint — tests/test_plans.py uses that to prove no query carries
an unconditional broadcast of a scaling relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GATE_CONF = "spark.ripcurrent.broadcastGateBytes"
DEFAULT_GATE_BYTES = 256 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (bytes), or None if the
    estimate is unavailable. Analysis-time only — never runs a job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - JVM bridge hiccup
        return None


def bcast(df: DataFrame, gauge: DataFrame | None = None) -> DataFrame:
    """Broadcast-hint ``df`` only when its estimated size is under the
    gate; otherwise return it unhinted and let AQE decide at runtime.

    ``gauge``: optional frame whose size estimate upper-bounds ``df``
    (use the base table scan when ``df`` is join-derived, where the
    basic estimator's child-product is uselessly pessimistic).
    """
    threshold = int(df.sparkSession.conf.get(GATE_CONF, str(DEFAULT_GATE_BYTES)))
    est = plan_size_bytes(gauge if gauge is not None else df)
    if est is not None and 0 <= est <= threshold:
        return F.broadcast(df)
    return df


def spread_if_narrow_scan(df: DataFrame, *repartition_args) -> DataFrame:
    """Repartition a SCAN-SHAPED frame across the cluster only when its
    static partition count under-fills it; pass-through otherwise.

    The shared probe behind multimodal.phash_media and the ivf_cells
    artifact build (extracted r11 so both sites carry the same audited
    gate — ADVICE r9 #2 / VERDICT r10 #3). Rationale: at production
    scale the parquet scan already yields ~maxPartitionBytes-sized
    splits >= cores and NO exchange is needed; only a small corpus
    (one file, ~2 splits, 30 idle cores) benefits from spreading —
    exactly the case where the shuffled volume is cheap.

    The probe is only trusted for scan-shaped inputs:
    ``rdd.getNumPartitions()`` reports the STATIC pre-AQE count, so on
    a plan containing an Exchange it returns
    ``spark.sql.shuffle.partitions`` (>= defaultParallelism) and would
    silently skip the spread precisely when AQE coalesces to a few
    runtime partitions. An exchanged input is already being spread by
    its own shuffle, so skipping the extra repartition there is the
    right call — the probe is gated on the physical plan being
    exchange-free.

    ``repartition_args`` are forwarded to ``df.repartition`` verbatim
    (e.g. ``"media_id"`` or ``(n, "vec_id")``) so each call site keeps
    its established spread shape.
    """
    sc = df.sparkSession.sparkContext
    try:
        exchange_free = (
            "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
        )
    except Exception:  # pragma: no cover - plan API drift: skip spread
        exchange_free = False
    if exchange_free and df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(*repartition_args)
    return df
