"""Table loaders for the driver's parquet test tables.

At 100 TB these would be catalog tables (partitioned / bucketed);
here each table is a single parquet file. Loading stays declarative
(`spark.read.parquet`) so Catalyst keeps pushdown + pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Some tables carry parquet TIMESTAMP(NANOS) which Spark only reads
    # as long (nanos since epoch) under the legacy flag; normalize those
    # columns back to microsecond timestamps (DuckDB truncates the same
    # way, so oracle parity holds).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
