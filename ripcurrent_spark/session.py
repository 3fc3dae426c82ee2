"""Tuned SparkSession factory.

Defaults chosen for correctness-parity with the DuckDB oracle (UTC
session timezone) and for scale (AQE on, arrow on, shuffle
partitions sized to cores locally; on a real cluster these come from
spark-submit conf and the factory only fills gaps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ripcurrent_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Before the JVM launches: make google.protobuf importable (vendored
    # fallback) so transformWithStateInPandas workers can speak the
    # state-server protocol. No-op when the real wheel is installed.
    from ripcurrent_spark.protoshim import ensure_protobuf

    try:
        ensure_protobuf()
    except ImportError:  # pragma: no cover - shim missing entirely
        pass

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Runtime bloom-filter pruning: a selective filter on one join
        # side prunes the other side's scan at run time — free win for
        # selective fact-fact joins at scale, off by default upstream.
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
