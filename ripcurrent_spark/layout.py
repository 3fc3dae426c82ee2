"""Data-layout optimization: zone-map (min/max) file skipping and
Z-order multi-dimensional clustering on plain parquet.

At 100 TB the fastest scan is the one that never reads the file: the
Iceberg/Delta pattern keeps per-file column min/max stats and prunes
files whose range cannot match the predicate. Parquet already stores
those stats in every footer, so the manifest here is built
METADATA-ONLY (pyarrow footer reads, no data IO) and a pruned scan
passes Spark only the surviving file paths — Catalyst then still does
row-group pushdown inside them.

Skipping only works if values are clustered: `write_range_layout`
range-partitions + sorts by one column (tight zones on that column),
and `zorder_key` interleaves the bits of two dimensions so ONE sort
order gives bounded bounding boxes on BOTH columns — the standard
space-filling-curve trade (each dim's per-file span ~sqrt of the
linear layout's) when queries filter either dimension.

Reference context: the reference engine replicates into flat files/
tables with no layout control (Main.java target jobs); this module is
the Spark-side answer for making those targets queryable at scale.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_zonemap.json"


# ------------------------------------------------------------------ z-order
def zorder_key(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """Interleave the low `bits` bits of two non-negative ints:
    z = ... y1 x1 y0 x0. Pure Column arithmetic (shift/and/sum) —
    JVM-codegen, no UDF."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(cx.cast("long"), j).bitwiseAND(F.lit(1)), 2 * j)
        z = z + F.shiftleft(F.shiftright(cy.cast("long"), j).bitwiseAND(F.lit(1)), 2 * j + 1)
    return z


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`zorder_key` (identical integer result)."""
    # every term fully parenthesized: SQL gives '+' higher precedence
    # than '<<', so a bare `a << 2 + b << 3` parses as a << (2+b) << 3
    terms = []
    for j in range(bits):
        terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


# ------------------------------------------------------------- write layouts
def write_range_layout(
    df: DataFrame, path: str | Path, sort_cols: Sequence[str], n_files: int
) -> None:
    """Range-partition into `n_files` files, sorted within each — the
    layout that makes zone maps selective on `sort_cols[0]` (and
    secondarily on the rest). One range shuffle; at cluster scale
    n_files tracks target file size (write_parquet_sized's estimator),
    not a constant."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(str(path))
    )
    build_zonemap(path)


def write_zorder_layout(
    df: DataFrame,
    path: str | Path,
    x: str,
    y: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Cluster by the Z-curve over (x, y): range-partition + sort on
    the interleaved key, then drop it. Both x and y end up with
    bounded per-file spans, so zone maps prune on either dimension."""
    zdf = df.withColumn("_z", zorder_key(x, y, bits))
    (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(str(path))
    )
    build_zonemap(path)


# ----------------------------------------------------------------- zone maps
def build_zonemap(path: str | Path) -> list[dict]:
    """Collect per-file column min/max/null-count from parquet FOOTERS
    (metadata-only; bytes read ~ KB per file regardless of data size)
    and persist them as the `_zonemap.json` manifest.

    On a cluster this step is a flatMap over file paths returning one
    manifest row each — driver-side here because local file listings
    are tiny."""
    root = Path(path)
    entries: list[dict] = []
    for f in sorted(root.glob("*.parquet")):
        md = pq.read_metadata(f)
        stats: dict[str, dict] = {}
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                s = col.statistics
                if s is None or not s.has_min_max:
                    continue
                mn, mx = s.min, s.max
                cur = stats.setdefault(name, {"min": mn, "max": mx})
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
        entries.append({"file": f.name, "rows": md.num_rows, "stats": _jsonable(stats)})
    (root / MANIFEST).write_text(json.dumps(entries, indent=1, default=str))
    return entries


def _jsonable(stats: dict) -> dict:
    out = {}
    for k, v in stats.items():
        out[k] = {kk: (vv.isoformat() if hasattr(vv, "isoformat") else vv) for kk, vv in v.items()}
    return out


def read_zonemap(path: str | Path) -> list[dict]:
    return json.loads((Path(path) / MANIFEST).read_text())


def prune_files(path: str | Path, col: str, lo, hi) -> tuple[list[str], int]:
    """File paths whose [min,max] zone for `col` intersects [lo, hi],
    plus the total file count. Files without stats for `col` are kept
    (skipping must never drop a possibly-matching file)."""
    root = Path(path)
    manifest = read_zonemap(root)
    keep: list[str] = []
    for e in manifest:
        s = e["stats"].get(col)
        if s is None or not (s["max"] < lo or s["min"] > hi):
            keep.append(str(root / e["file"]))
    return keep, len(manifest)


def scan_pruned(
    spark: SparkSession, path: str | Path, col: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """Read only the files whose zones can match col BETWEEN lo AND hi,
    with the residual predicate still applied (zones admit false
    positives, never false negatives). Returns (df, files_read,
    files_total)."""
    files, total = prune_files(path, col, lo, hi)
    if not files:
        empty = spark.read.parquet(str(path)).filter(F.lit(False))
        return empty, 0, total
    df = spark.read.parquet(*files).filter(F.col(col).between(lo, hi))
    return df, len(files), total
