"""Round-4 operator hardening tests: hot-band candidate caps and the
anti-join form of the inverted-index document-frequency guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.operators.dedup import candidate_pairs_by_key
from ripcurrent_spark.queries.dedup import _SH_MAX_DF, _capped_bands


def test_capped_bands_drops_hot_band_groups(spark):
    """A planted identical-fingerprint cluster larger than _SH_MAX_DF
    contributes ZERO band rows to candidate generation (bounded work,
    not quadratic pairs), while small groups are untouched."""
    n_hot = _SH_MAX_DF + 200
    rows = [(i, 111, 222) for i in range(n_hot)] + [
        (1_000_000, 333, 444),
        (1_000_001, 333, 444),
        (1_000_002, 555, 666),
    ]
    t = spark.createDataFrame(rows, "doc_id long, sh_a long, sh_b long")
    kept = _capped_bands(t)
    ids = {r.doc_id for r in kept.select("doc_id").distinct().collect()}
    assert ids == {1_000_000, 1_000_001, 1_000_002}
    # The surviving pair join is tiny: exactly the planted 2-doc group.
    a = kept.select(F.col("doc_id").alias("id_a"), "b", "bval")
    b = kept.select(F.col("doc_id").alias("id_b"), "b", "bval")
    pairs = (
        a.join(b, ["b", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    )
    assert {(r.id_a, r.id_b) for r in pairs} == {(1_000_000, 1_000_001)}


def test_capped_bands_keeps_groups_at_cap(spark):
    """Groups of exactly _SH_MAX_DF docs survive (the cap is a strict
    > threshold, mirroring the oracle's COUNT(*) <= cap window)."""
    rows = [(i, 777, 888) for i in range(_SH_MAX_DF)]
    t = spark.createDataFrame(rows, "doc_id long, sh_a long, sh_b long")
    assert _capped_bands(t).count() == _SH_MAX_DF * 4  # 4 bands each


def test_candidate_pairs_max_df_anti_join_semantics(spark):
    """The df guard keeps keys at the cap, drops keys above it, and
    never emits pairs through a dropped key — identical semantics to
    the old kept-set inner join, now via a hot-set anti-join."""
    rows = (
        [(i, "hot") for i in range(5)]
        + [(10, "warm"), (11, "warm")]
        + [(20, "cold")]
    )
    keyed = spark.createDataFrame(rows, "doc_id long, k string")
    pairs = candidate_pairs_by_key(keyed, "doc_id", "k", max_df=2).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(10, 11)}
    # Without a cap the hot key contributes all 10 pairs.
    pairs_all = candidate_pairs_by_key(keyed, "doc_id", "k").collect()
    assert len(pairs_all) == 10 + 1
