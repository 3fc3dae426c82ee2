"""Structured Streaming CDC pipeline (the reference's Debezium
embedded-engine event loop, Main.java:159-336, as readStream ->
transform -> foreachBatch sinks)."""

from ripcurrent_spark.streaming.pipeline import (
    masked_cdc_stream,
    read_cdc_stream,
    schema_change_audit,
    upsert_foreach_batch,
    with_routing_key,
)

__all__ = [
    "read_cdc_stream",
    "masked_cdc_stream",
    "schema_change_audit",
    "upsert_foreach_batch",
    "with_routing_key",
]
