"""Multimodal (image/audio/video) column handling.

Design for 100 TB: media bytes ride as an opaque ``binary`` column
next to typed metadata (mime/width/height/duration), so Parquet column
pruning skips the payload unless a stage needs it. Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the only sane
Python boundary: one (de)serialization per batch, bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``, and the UDF sees a
whole batch so vectorized decoders (PIL/ffmpeg/torchvision) slot in
unchanged.

The actual codec is STUBBED (no image/audio libs in this container):
``_decode_stub`` produces deterministic pseudo-features from the raw
bytes. The Spark-side plumbing — schema, batch iteration, partition
behavior — is real and tested; swap ``_decode_stub`` for a real
decoder to productionize.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a media table from a text table (test harness: the
    driver data has no binary columns). Payload = UTF-8 bytes; a real
    pipeline reads payloads from object storage / parquet binary."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_stub(payload: bytes) -> tuple[str, list[float]]:
    """Deterministic stand-in for a real media decoder. Raises for
    unsupported/real codecs on purpose — this container has no media
    libraries (see module docstring)."""
    digest = hashlib.md5(payload).hexdigest()
    # 8 pseudo-features in [0,1): consecutive digest byte pairs.
    feat = [int(digest[i : i + 2], 16) / 256.0 for i in range(0, 16, 2)]
    return digest, feat


def extract_features(
    media: DataFrame,
    batch_hint: int | None = None,
    decoder=None,
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas. Partitioning
    is preserved (narrow op — no shuffle); payload bytes never hit the
    driver.

    ``decoder`` is the codec seam: any
    ``(payload: bytes) -> (digest: str, feature: list[float])``
    callable (e.g. a PIL/torchvision wrapper) ships in the closure and
    runs per payload inside the Arrow batch — the stage itself is
    codec-agnostic (tested with an injected fake in
    tests/test_multimodal.py). Defaults to the deterministic stub
    because this container has no media libraries."""
    decode = decoder or _decode_stub

    def _run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            digests, feats, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                digest, feat = decode(b)
                digests.append(digest)
                feats.append(feat)
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": sizes,
                    "digest": digests,
                    "feature": feats,
                }
            )

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("src_digest", T.StringType()),
    ]
)


def _resize_stub(payload: bytes, w: int, h: int) -> tuple[str, bytes]:
    """Deterministic stand-in for a real resampler (PIL.Image.resize /
    ffmpeg scale): thumb bytes are an md5 chain over (payload, WxH),
    length = min(len(payload), w*h//256). Like _decode_stub, the point
    is that the PLUMBING (schema, Arrow batching, payload lifecycle)
    is real; the codec swaps in at prod."""
    tag = f"{w}x{h}".encode()
    src_digest = hashlib.md5(payload + b":" + tag).hexdigest()
    n_out = min(len(payload), max(1, (w * h) // 256))
    chain = b""
    block = src_digest.encode()
    while len(chain) < n_out:
        block = hashlib.md5(block).hexdigest().encode()
        chain += block
    return src_digest, chain[:n_out]


def resize_media(
    media: DataFrame, width: int, height: int, resizer=None
) -> DataFrame:
    """Arrow-batched thumbnail resize over mapInPandas: narrow (no
    shuffle), payload in/payload out, metadata width/height rewritten
    to the target box. Output payload size is bounded by the target
    dims, so a 100 TB corpus shrinks in one map-only stage.

    ``resizer`` is the codec seam: any
    ``(payload: bytes, w: int, h: int) -> (digest: str, thumb: bytes)``
    callable (PIL.Image.resize / ffmpeg scale wrapper) drops in; the
    stage is codec-agnostic. Defaults to the md5-chain stub (no media
    libraries in this container)."""
    resize = resizer or _resize_stub

    def _run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            digests, thumbs = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                digest, thumb = resize(b, width, height)
                digests.append(digest)
                thumbs.append(thumb)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": thumbs,
                    "src_digest": digests,
                }
            )

    return media.mapInPandas(_run, schema=RESIZED_SCHEMA)
