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
