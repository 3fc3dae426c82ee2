"""Data-layout queries: Z-order locality proof.

The write-side layout machinery (zone-map manifests, range / Z-order
file clustering, metadata-only pruned scans) lives in
`ripcurrent_spark/layout.py` and is file-IO, so it is exercised by
`tests/test_layout.py`; this registry entry oracle-checks the
Z-CURVE ARITHMETIC itself — the part both engines can compute — and
demonstrates the locality property that makes the layout worth
writing: consecutive z-key ranges have bounded bounding boxes in BOTH
dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripcurrent_spark.functions.timeutil import epoch_seconds
from ripcurrent_spark.io import load
from ripcurrent_spark.layout import zorder_key, zorder_key_sql
from ripcurrent_spark.queries import register

_BITS = 6  # 64x64 grid; 16 z-buckets of 256 keys => 16x16 boxes


@register(
    "q_zorder_locality",
    oracle=f"""
WITH t AS (
  SELECT user_id % 64 AS xd,
         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 64 AS yd
  FROM events
),
z AS (SELECT xd, yd, {zorder_key_sql('xd', 'yd', _BITS)} AS zkey FROM t)
SELECT zkey // 256 AS zbucket,
       COUNT(*) AS n,
       min(xd) AS x_min, max(xd) AS x_max,
       min(yd) AS y_min, max(yd) AS y_max
FROM z GROUP BY zbucket ORDER BY zbucket
""",
)
def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket bounding boxes over a 64x64 (user, hour) grid.

    Every bucket of 256 consecutive z-keys must span at most 16 in
    each dimension (the space-filling-curve guarantee); a linear
    layout's buckets would span the full 64 on the minor dimension.
    The interleave is pure shift/and/sum Column arithmetic — identical
    integers on both engines.
    """
    e = load(spark, sf_dir, "events")
    t = e.select(
        (F.col("user_id") % 64).alias("xd"),
        (F.floor(epoch_seconds(e, "ts") / 3600).cast("long") % 64).alias("yd"),
    )
    z = t.withColumn("zkey", zorder_key("xd", "yd", _BITS))
    return (
        z.groupBy(F.floor(F.col("zkey") / 256).cast("long").alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("xd").alias("x_min"),
            F.max("xd").alias("x_max"),
            F.min("yd").alias("y_min"),
            F.max("yd").alias("y_max"),
        )
        .orderBy("zbucket")
    )
