"""Property-based invariants (hypothesis) for the masking and dedup
primitives — laws the DuckDB oracle can't state: roundtrips,
idempotence, format preservation, permutation-invariance.

Each example is a BATCH of generated strings pushed through one Spark
job (per-row assertions on the collected result), keeping job count ~
max_examples, not rows.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ripcurrent_spark.functions import masking as M
from ripcurrent_spark.operators import dedup as DD

# Text without NUL (parquet/JVM strings) — mixed unicode.
texts = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"), max_size=40),
    min_size=1,
    max_size=8,
)

SET = settings(max_examples=15, deadline=None)


def _col_out(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.o for r in df.select(expr.alias("o")).collect()]


@given(texts)
@SET.__call__
def test_hex_roundtrip(spark, vals):
    out = _col_out(spark, vals, M.decode_hex(M.encode_hex(F.col("v"))))
    assert out == vals


@given(texts)
@SET.__call__
def test_fpe_preserves_format(spark, vals):
    out = _col_out(spark, vals, M.fpe_digits(F.col("v")))
    for src, dst in zip(vals, out):
        assert len(src) == len(dst)
        for a, b in zip(src, dst):
            if a.isascii() and a.isdigit():
                assert b.isascii() and b.isdigit()
            else:
                assert a == b


@given(texts)
@SET.__call__
def test_norm_text_idempotent(spark, vals):
    once = _col_out(spark, vals, DD.norm_text(F.col("v")))
    df = spark.createDataFrame([(v,) for v in once], "v string")
    twice = [r.o for r in df.select(DD.norm_text(F.col("v")).alias("o")).collect()]
    assert twice == once


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=30), min_size=1, max_size=6))
@SET.__call__
def test_minhash_permutation_invariant(spark, vals):
    # Same shingle SET in any order -> identical signature.
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    base = df.select(
        DD.minhash_sig(DD.ngrams(F.col("v"))).alias("o")
    ).collect()
    flipped = df.select(
        DD.minhash_sig(F.reverse(DD.ngrams(F.col("v")))).alias("o")
    ).collect()
    assert [r.o for r in base] == [r.o for r in flipped]


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50))
@SET.__call__
def test_split_label_disjoint_exhaustive(spark, ids):
    from ripcurrent_spark.operators.sampling import split_label

    df = spark.createDataFrame([(i,) for i in set(ids)], "doc_id long")
    rows = df.select("doc_id", split_label("doc_id").alias("s")).collect()
    assert all(r.s in ("train", "val", "test") for r in rows)
    assert len(rows) == len(set(ids))


@given(texts)
@SET.__call__
def test_fpe_digits_roundtrip(spark, vals):
    out = _col_out(spark, vals, M.fpe_digits_decode(M.fpe_digits(F.col("v"))))
    assert out == vals
