"""Deterministic synthetic changelog derived from the `orders` table.

The driver's test data has no CDC stream, so CDC operators are
exercised on a changelog that is a pure function of `orders` — both
the Spark builder here and the DuckDB oracle CTE (queries/cdc.py
CHANGELOG_CTE) compute the identical event set:

- every order       -> 'c' (insert)  at ts = epoch_ms(o_orderdate), seq 1
- status 'O' orders -> 'u' (update)  +1 day, totalprice * 1.05, seq 2
- o_orderkey % 7 = 0 -> 'd' (delete) +2 days, seq 3

Columns: op, seq, ts_ms, o_orderkey (key), o_custkey, o_orderstatus,
totalprice DECIMAL(12,2) (exact — both engines do identical decimal
arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripcurrent_spark.functions.timeutil import epoch_millis
from ripcurrent_spark.io import load

DAY_MS = 86_400_000


def synth_changelog(
    spark: SparkSession, sf_dir: str, with_before: bool = False
) -> DataFrame:
    """``with_before=True`` adds a ``_before`` map<string,string>
    column: the key's INSERT image on 'u'/'d' events (each key sees
    exactly one pre-update state here), NULL on 'c' — Debezium's
    before-image contract (Main.java:171-178). Computed inline per
    branch from the same scan, because every branch still HAS the
    original column values: reconstructing it downstream would take a
    changelog-to-insert self-join (a full extra shuffle at scale)."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    # Wall-clock-as-UTC epoch millis regardless of session tz, so the
    # synthetic ts_ms matches DuckDB's epoch_ms on any driver.
    ts = epoch_millis(o, "o_orderdate")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        price.alias("price"),
        ts.alias("ins_ts"),
    )
    ins_image = F.map_from_arrays(
        F.array(
            F.lit("o_orderkey"),
            F.lit("o_custkey"),
            F.lit("o_orderstatus"),
            F.lit("totalprice"),
        ),
        F.array(
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("price").cast("string"),
        ),
    )
    null_image = F.lit(None).cast("map<string,string>")

    def _with_before(df: DataFrame, img) -> DataFrame:
        return df.withColumn("_before", img) if with_before else df

    inserts = _with_before(base, null_image).select(
        F.lit("c").alias("op"),
        F.lit(1).alias("seq"),
        F.col("ins_ts").alias("ts_ms"),
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("price").alias("totalprice"),
        *(["_before"] if with_before else []),
    )
    updates = _with_before(
        base.filter(F.col("o_orderstatus") == "O"), ins_image
    ).select(
        F.lit("u").alias("op"),
        F.lit(2).alias("seq"),
        (F.col("ins_ts") + DAY_MS).alias("ts_ms"),
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("price") * F.lit("1.05").cast("decimal(3,2)"), 2)
        .cast("decimal(12,2)")
        .alias("totalprice"),
        *(["_before"] if with_before else []),
    )
    deletes = _with_before(
        base.filter(F.col("o_orderkey") % 7 == 0), ins_image
    ).select(
        F.lit("d").alias("op"),
        F.lit(3).alias("seq"),
        (F.col("ins_ts") + 2 * DAY_MS).alias("ts_ms"),
        "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("decimal(12,2)").alias("totalprice"),
        *(["_before"] if with_before else []),
    )
    return inserts.unionByName(updates).unionByName(deletes)


CHANGELOG_CTE = """
changelog AS (
  SELECT 'c' AS op, 1 AS seq, epoch_ms(o_orderdate) AS ts_ms,
         o_orderkey, o_custkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice
  FROM orders
  UNION ALL
  SELECT 'u', 2, epoch_ms(o_orderdate) + 86400000,
         o_orderkey, o_custkey, o_orderstatus,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,2)) * 1.05, 2) AS DECIMAL(12,2))
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT 'd', 3, epoch_ms(o_orderdate) + 172800000,
         o_orderkey, NULL, NULL, NULL
  FROM orders WHERE o_orderkey % 7 = 0
)
"""
