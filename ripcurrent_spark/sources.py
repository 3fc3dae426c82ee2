"""Source connectors.

The reference ingests via Debezium connectors (MySQL/Postgres/Oracle/
Vitess — Main.java:71-80); network databases aren't reachable here, so
the engine-side surface is: schema'd file readers (parquet/csv/json),
Debezium-JSON envelope readers (batch + stream), and a JDBC reader
gated behind availability of a driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader (built into Spark): same columnar pushdown/pruning
    contract as parquet — predicate pushdown and column projection
    reach the ORC stripe reader, verified in tests/test_io.py."""
    return spark.read.orc(path)


def read_debezium_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of Debezium-style JSON change events -> parsed
    envelope columns (streaming twin: streaming.read_cdc_stream)."""
    raw = spark.read.json(path, schema="key string, value string")
    return parse_envelope(raw)


# Spark's Kafka source wire schema (what format("kafka") emits).
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_records_to_envelope(records: DataFrame) -> DataFrame:
    """Kafka wire records (binary key/value, Debezium JSON payloads) ->
    the SAME parsed-envelope contract as the file readers, so every
    downstream operator (decode, classify, mask, upsert, SCD2) is
    transport-agnostic. Works on batch and streaming frames alike
    (pure cast + parse, no stateful ops). Topic/partition/offset are
    carried through as ``_topic``/``_partition``/``_offset`` for
    provenance and exactly-once bookkeeping."""
    raw = records.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
    )
    return parse_envelope(raw)


def read_debezium_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_pattern: str,
    starting_offsets: str = "earliest",
    streaming: bool = True,
    max_offsets_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Debezium change events from Kafka topics -> parsed envelope.

    The reference attaches a Debezium *embedded engine* directly to the
    database (Main.java:71-80, engine start Main.java:159); the standard
    Spark transport for the same connectors is Debezium Server/Connect
    writing to Kafka, consumed here with ``subscribePattern`` (one
    topic per table, e.g. ``server1\\.public\\..*``). Requires the
    spark-sql-kafka artifact on the classpath (not shipped in this
    image — the contract is pinned transport-independently by
    tests/test_kafka_source.py via :func:`kafka_records_to_envelope`).

    ``max_offsets_per_trigger`` bounds per-micro-batch intake — the
    backpressure lever at 100 TB backfills."""
    reader = spark.readStream if streaming else spark.read
    reader = (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", topic_pattern)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return kafka_records_to_envelope(reader.load())


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
