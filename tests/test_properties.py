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


# ---------------------------------------------------------------------------
# Randomized merge/upsert/compaction sequences vs a naive in-memory
# model (the round-2 review found a NULL-key merge bug only AFTER the
# fact — this hunts that class up front). Each example replays a
# random interleaving of changelog upserts, MERGE INTO calls with
# random update/insert/delete settings, and offline compactions
# against a dict model; at the end the bucketed target must equal the
# model exactly. 25 examples x 8-10 ops >= 200 generated op-cases.
# ---------------------------------------------------------------------------

MERGE_SCHEMA = "op string, ts_ms long, id int, val string, bal int"

_upsert_events = st.lists(
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=11),
        st.sampled_from(["x", "y", "z"]),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=1,
    max_size=4,
)

_merge_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],  # MERGE requires unique source keys
)

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _upsert_events),
        st.tuples(
            st.just("merge"),
            _merge_rows,
            st.sampled_from(["all", None]),  # update mode
            st.booleans(),                   # insert
            st.booleans(),                   # use delete_when
        ),
        st.tuples(st.just("compact")),
    ),
    min_size=8,
    max_size=10,
)


@given(_ops)
@settings(max_examples=25, deadline=None)
def test_merge_sequences_match_naive_model(spark, seq):
    import itertools
    import shutil
    import tempfile
    from pathlib import Path

    from ripcurrent_spark.sinks import (
        compact_snapshot_buckets,
        has_bucketed_data,
        merge_into,
        read_merge_target,
        upsert_parquet,
    )

    tdir = tempfile.mkdtemp(prefix="mergeprop")
    target = str(Path(tdir) / "t")
    ts = itertools.count(1)  # strictly increasing event time
    model: dict[int, tuple] = {}
    try:
        for op in seq:
            if op[0] == "upsert":
                events = [(o, next(ts), i, v, b) for (o, i, v, b) in op[1]]
                upsert_parquet(
                    spark.createDataFrame(events, MERGE_SCHEMA),
                    target, key_cols=["id"], n_buckets=4,
                )
                for e in events:  # latest-per-key == sequential apply (ts increasing)
                    if e[0] == "d":
                        model.pop(e[2], None)
                    else:
                        model[e[2]] = e
            elif op[0] == "merge":
                _, rows, update, insert, use_del = op
                events = [("u", next(ts), i, v, b) for (i, v, b) in rows]
                merge_into(
                    spark.createDataFrame(events, MERGE_SCHEMA),
                    target, on=["id"], update=update, insert=insert,
                    delete_when="s.bal < 0" if use_del else None, n_buckets=4,
                )
                for e in events:
                    i, b = e[2], e[4]
                    if i in model:
                        if use_del and b < 0:
                            del model[i]
                        elif update == "all":
                            model[i] = e
                    elif insert:
                        model[i] = e
            else:
                compact_snapshot_buckets(spark, target, min_files=2)

        if has_bucketed_data(target):
            got = {
                r.id: (r.op, r.ts_ms, r.id, r.val, r.bal)
                for r in read_merge_target(spark, target).collect()
            }
        else:
            got = {}
        assert got == model
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


# --- exact distributed ranking laws -----------------------------------

rank_rows = st.lists(
    st.tuples(st.integers(-50, 50)),  # heavy ties by design
    min_size=1,
    max_size=60,
)
RANK_SET = settings(max_examples=10, deadline=None)


@given(rank_rows)
@RANK_SET.__call__
def test_exact_global_ranks_law(spark, vals):
    """exact_global_ranks == unpartitioned row_number() for ANY data,
    including all-equal values (ties split only by the unique id) and
    degenerate sample/bucket counts."""
    from pyspark.sql import Window as W

    from ripcurrent_spark.operators.ranking import exact_global_ranks, ntile_expr

    rows = [(i, v[0]) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = exact_global_ranks(
        df, [("v", True), ("id", False)], unique_col="id",
        out_col="rk", n_buckets=5, sample_k=7, total_col="tot",
    ).select("id", "rk", ntile_expr(F.col("rk"), F.col("tot"), 3).alias("t"))
    w = W.orderBy(F.desc("v"), "id")
    want = df.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.ntile(3).over(w).alias("t"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


multi_rank_rows = st.lists(
    st.tuples(st.integers(-20, 20), st.integers(0, 5)),  # two tie-heavy keys
    min_size=1,
    max_size=50,
)


@given(multi_rank_rows)
@RANK_SET.__call__
def test_exact_global_ranks_multi_law(spark, vals):
    """exact_global_ranks_multi == chained unpartitioned row_numbers
    for ANY data under SEVERAL simultaneous key orders — including
    all-ties, tiny frames, and degenerate sample/bucket counts. Pins
    the r7 fused machinery end-to-end: one shared sample, generated-
    SQL cut predicates, posexplode-fused counts, literal offsets."""
    from pyspark.sql import Window as W

    from ripcurrent_spark.operators.ranking import exact_global_ranks_multi

    rows = [(i, a, b) for i, (a, b) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = exact_global_ranks_multi(
        df,
        [
            ([("a", True), ("id", False)], "ra"),
            ([("b", False), ("a", True), ("id", False)], "rb"),
        ],
        unique_col="id",
        n_buckets=4,
        sample_k=6,
        total_col="tot",
    ).select("id", "ra", "rb", "tot")
    want = df.select(
        "id",
        F.row_number().over(W.orderBy(F.desc("a"), "id")).alias("ra"),
        F.row_number().over(W.orderBy("b", F.desc("a"), "id")).alias("rb"),
        F.lit(len(rows)).cast("long").alias("tot"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
