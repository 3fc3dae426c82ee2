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


@register(
    "mm_frame_sample",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
  FROM documents WHERE n_chars > 0
)
SELECT media_id,
       unnest(range(0, duration_ms, 1000)) AS frame_ts_ms,
       duration_ms
FROM media
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plan: one frame descriptor per second of
    media, generated from duration METADATA only (sequence + explode —
    narrow, codegen, the payload column is never read; the actual
    frame decode is the stubbed mapInPandas stage in
    mm_extract_features). Duration is synthesized from n_chars (the
    driver tables carry no real media)."""
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 10).alias("duration_ms"),
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("duration_ms") - 1, F.lit(1000))).alias(
            "frame_ts_ms"
        ),
        "duration_ms",
    )
