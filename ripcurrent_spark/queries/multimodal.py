"""Multimodal query surface (rows-only: feature extraction crosses the
Arrow/Pandas boundary — no SQL mirror)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ripcurrent_spark.io import load
from ripcurrent_spark.multimodal import attach_media, extract_features
from ripcurrent_spark.queries import register


@register(
    "mm_extract_features",
    doc="Binary media column + typed metadata -> Arrow-batched "
    "mapInPandas feature extraction (stubbed decoder; real plumbing). "
    "Rows-only by nature.",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return extract_features(attach_media(d, "doc_id", "text"))
