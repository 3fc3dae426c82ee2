"""Bucketed-table co-located join: the write-once-shuffle-never lever.

Two tables bucketed on their join key must sort-merge-join with ZERO
Exchange on the join inputs — at 100 TB this converts every repeated
fact-fact join on the bucket key from a full shuffle into a local
merge per bucket.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.sinks import write_bucketed_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_join_no_shuffle(spark, no_broadcast):
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    for tbl in ("bkt_lineitem", "bkt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    try:
        write_bucketed_table(l, "bkt_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
        write_bucketed_table(o, "bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        j = (
            spark.table("bkt_lineitem")
            .join(spark.table("bkt_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # Only the post-join aggregate may exchange; the join reads
        # bucket-aligned inputs directly.
        assert plan.count("Exchange hashpartitioning") == 1
        total = sum(r.n for r in j.collect())
        assert total == l.count()
    finally:
        for tbl in ("bkt_lineitem", "bkt_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-partitioned writes let the reader skip entire directories:
    the partition predicate must show up as PartitionFilters (pruning)
    rather than a post-scan filter."""
    from ripcurrent_spark.io import load
    from ripcurrent_spark.sinks import write_parquet

    e = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "event_type", "value")
    out = str(tmp_path / "events_by_type")
    write_parquet(e, out, partition_by=["event_type"])

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    clicks = e.filter(F.col("event_type") == "click").count()
    assert df.count() == clicks


def test_sized_write_controls_file_count(spark, tmp_path):
    import glob

    from ripcurrent_spark.sinks import write_parquet_sized

    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "sized")
    write_parquet_sized(df, out, target_rows_per_file=2_500)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4
    assert spark.read.parquet(out).count() == 10_000
