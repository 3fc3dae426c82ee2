"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``ripcurrent_spark``; this module only
adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: classification-driven masked replica of `customer`
    (the reference engine's end-to-end behavior) at sf0.001."""
    from ripcurrent_spark.queries import all_queries

    reg = all_queries()
    name = "masked_replica_customer" if "masked_replica_customer" in reg else "q1_pricing_summary"
    return reg[name].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ripcurrent_spark.queries import all_queries

    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from ripcurrent_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
