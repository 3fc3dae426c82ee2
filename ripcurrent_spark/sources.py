"""Source connectors.

The reference ingests via Debezium connectors (MySQL/Postgres/Oracle/
Vitess — Main.java:71-80); network databases aren't reachable here, so
the engine-side surface is: schema'd file readers (parquet/csv/json),
Debezium-JSON envelope readers (batch + stream), and a JDBC reader
gated behind availability of a driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ripcurrent_spark.cdc.envelope import parse_envelope


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema'd CSV (never inferSchema — a schema scan at 100 TB is a
    full extra pass)."""
    return spark.read.csv(path, schema=schema, header=header, sep=sep)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.json(path, schema=schema)


def read_debezium_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of Debezium-style JSON change events -> parsed
    envelope columns (streaming twin: streaming.read_cdc_stream)."""
    raw = spark.read.json(path, schema="key string, value string")
    return parse_envelope(raw)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC source with bounded parallel reads. No driver jar ships in
    this image — callers get the JVM's ClassNotFound at .load(); tests
    exercise option construction only."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
