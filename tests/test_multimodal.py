"""Multimodal plumbing: binary columns survive the Arrow boundary,
mapInPandas batch shape is correct, features are deterministic."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ripcurrent_spark.multimodal import attach_media, extract_features


def test_attach_and_extract(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], "id long, text string")
    media = attach_media(df, "id", "text")
    assert dict(media.dtypes)["payload"] == "binary"

    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert set(feats) == {1, 2}
    r = feats[1]
    assert r.n_bytes == 5
    assert r.digest == hashlib.md5(b"hello").hexdigest()
    assert len(r.feature) == 8
    assert all(0.0 <= x < 1.0 for x in r.feature)


def test_extract_deterministic_across_partitions(spark):
    df = spark.createDataFrame([(i, f"doc{i}") for i in range(50)], "id long, text string")
    a = extract_features(attach_media(df, "id", "text")).orderBy("media_id").collect()
    b = (
        extract_features(attach_media(df.repartition(7), "id", "text"))
        .orderBy("media_id")
        .collect()
    )
    assert [r.digest for r in a] == [r.digest for r in b]


def test_extract_is_narrow_no_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = extract_features(attach_media(df, "id", "text"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas must not shuffle


def test_null_payload(spark):
    media = attach_media(
        spark.createDataFrame([(1, None)], "id long, text string"), "id", "text"
    )
    r = extract_features(media).collect()[0]
    assert r.n_bytes == 0
    assert r.digest == hashlib.md5(b"").hexdigest()


def test_resize_media_payload_bounded_and_deterministic(spark):
    from ripcurrent_spark.multimodal import attach_media
    from ripcurrent_spark.multimodal.columns import resize_media

    df = spark.createDataFrame(
        [(1, "hello world, a reasonably long payload string"), (2, "x")],
        "id long, body string",
    )
    out = resize_media(attach_media(df, "id", "body"), 64, 64)
    rows = {r.media_id: r for r in out.collect()}
    # bounded by min(len(payload), 64*64//256 = 16)
    assert len(rows[1].payload) == 16
    assert len(rows[2].payload) == 1
    assert rows[1].width == 64 and rows[1].height == 64
    # deterministic across runs
    again = {r.media_id: r for r in resize_media(attach_media(df, "id", "body"), 64, 64).collect()}
    assert bytes(again[1].payload) == bytes(rows[1].payload)
    assert again[1].src_digest == rows[1].src_digest


def test_codec_seam_injected_decoder(spark):
    """The mapInPandas stages are codec-agnostic: any callable with
    the documented signature drops in for the stub — the seam a real
    PIL/ffmpeg wrapper uses in production."""
    from ripcurrent_spark.multimodal.columns import (
        attach_media,
        extract_features,
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, "hello"), (2, "worldworld")], "id long, txt string"
    )
    media = attach_media(df, "id", "txt")

    def fake_decoder(payload: bytes):
        return f"len:{len(payload)}", [float(len(payload))] * 3

    feats = {r.media_id: r for r in extract_features(media, decoder=fake_decoder).collect()}
    assert feats[1].digest == "len:5" and feats[1].feature == [5.0, 5.0, 5.0]
    assert feats[2].digest == "len:10"

    def fake_resizer(payload: bytes, w: int, h: int):
        return f"{w}x{h}:{len(payload)}", payload[: w * h]

    thumbs = {r.media_id: r for r in resize_media(media, 2, 2, resizer=fake_resizer).collect()}
    assert thumbs[1].src_digest == "2x2:5"
    assert bytes(thumbs[1].payload) == b"hell"
    assert (thumbs[1].width, thumbs[1].height) == (2, 2)
