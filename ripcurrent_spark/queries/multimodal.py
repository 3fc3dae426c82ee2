"""Multimodal query surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ripcurrent_spark.io import load
from ripcurrent_spark.multimodal import attach_media, extract_features
from ripcurrent_spark.queries import register

# The stub decoder's pseudo-features are pure functions of the payload
# md5, so even the Arrow/Pandas path gets a full value oracle: feature
# i = hexpair_i(digest)/256 (dyadic -> exact in float32 on both sides).
# Emitted as scalar columns f0..f7 — an array-typed output column
# crashes the driver's pandas canonicalizer (unhashable list).
_FEATS = ", ".join(
    f"CAST(CAST('0x' || substr(digest, {2 * i + 1}, 2) AS INT) / 256.0 AS FLOAT) AS f{i}"
    for i in range(8)
)


@register(
    "mm_extract_features",
    oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id,
         'application/octet-stream' AS mime,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS digest
  FROM documents
)
SELECT media_id, mime, n_bytes, digest, {_FEATS}
FROM m
""",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + typed metadata -> Arrow-batched
    mapInPandas feature extraction. The decoder is the documented
    deterministic stub (no media libs in-image), which makes the whole
    Python boundary value-checkable: the oracle recomputes the same
    md5-derived features in SQL. The operator keeps the embedding as
    an array column (what a real pipeline stores); the query flattens
    it to scalars only for the canonicalizer-facing output."""
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    feats = extract_features(attach_media(d, "doc_id", "text"))
    return feats.select(
        "media_id",
        "mime",
        "n_bytes",
        "digest",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(8)],
    )


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


@register(
    "mm_resize_thumbnail",
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_src,
         md5(text || ':64x64') AS src_digest
  FROM documents
)
SELECT media_id, 64 AS width, 64 AS height, src_digest,
       CAST(least(n_src, 16) AS BIGINT) AS thumb_n_bytes,
       substr(md5(src_digest), 1, least(n_src, 16)) AS thumb_prefix
FROM m
""",
)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail resize through the Arrow boundary: payload -> 64x64
    'thumb' payload via mapInPandas (deterministic stub resampler —
    no PIL/ffmpeg in image; the md5-chain fake makes the ENTIRE
    Python path value-checkable in SQL, including the output bytes).
    The query surfaces the digest, output size, and the first 16
    thumb bytes decoded back to text so the oracle can recompute them.
    """
    from pyspark.sql import functions as F

    from ripcurrent_spark.multimodal.columns import resize_media

    d = load(spark, sf_dir, "documents")
    thumbs = resize_media(attach_media(d, "doc_id", "text"), 64, 64)
    return thumbs.select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "src_digest",
        F.octet_length("payload").cast("long").alias("thumb_n_bytes"),
        F.decode(F.substring("payload", 1, 16), "UTF-8").alias("thumb_prefix"),
    )
