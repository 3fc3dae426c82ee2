"""Multimodal column plumbing: opaque binary payloads + typed
metadata, batch feature extraction over mapInPandas."""

from ripcurrent_spark.multimodal.columns import (
    MEDIA_SCHEMA,
    FEATURE_SCHEMA,
    attach_media,
    extract_features,
)

__all__ = ["MEDIA_SCHEMA", "FEATURE_SCHEMA", "attach_media", "extract_features"]
