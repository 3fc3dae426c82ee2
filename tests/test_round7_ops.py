"""Round-7 tests: ADVICE r6 items (pareto tie survival, ranking desc
edge cases, sigstore GC + unpersist, record-sink byte-layout pin) and
VERDICT r6 items (degree-ordered triangle orientation, gated streaming
enrichment broadcast, fused multi-key ranking), plus sf0.01 parity for
every query rewritten this round."""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ripcurrent_spark.io import TABLES
from ripcurrent_spark.queries import all_queries
from tests.parity import assert_parity


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


# ------------------------------------------------------------- pareto tie


def test_pareto_survives_exact_price_tie(spark, tmp_path):
    """ADVICE r6 (high): dominance needs a strictly GREATER later
    price, so an order whose price exactly equals the best
    strictly-later price is NOT dominated. decimal(12,2) prices make
    exact ties realistic; the old `>` filter dropped them."""
    rows = [
        (1, "2024-01-01", "100.00"),  # ties the later max -> must survive
        (2, "2024-01-02", "100.00"),  # the later max itself -> survives
        (3, "2024-01-02", "50.00"),   # dominated by order 4 (later, 80 > 50)
        (4, "2024-01-03", "80.00"),   # latest date -> survives
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, d string, p string").select(
        "o_orderkey",
        # Match the testdata layout: TIMESTAMP dates, DOUBLE prices.
        F.to_timestamp("d").alias("o_orderdate"),
        F.col("p").cast("double").alias("o_totalprice"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    q = all_queries()["q_pareto_orders"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    result = q.spark(spark, str(tmp_path))
    assert_parity(result, con.sql(q.oracle), "q_pareto_orders_tie")
    keys = sorted(r.o_orderkey for r in result.collect())
    assert keys == [1, 2, 4]
    con.close()


# ------------------------------------------------- ranking desc edge cases


def test_ranking_rejects_descending_float_keys(spark):
    """-NaN is still NaN and Spark sorts it greatest in BOTH
    directions of the negated struct — so desc float/double keys must
    be rejected, not silently mis-ranked (ADVICE r6)."""
    from ripcurrent_spark.operators.ranking import exact_global_ranks

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="float/double"):
        exact_global_ranks(df, [("v", True), ("id", False)], unique_col="id")


def test_ranking_desc_long_min_value_matches_window(spark):
    """Long.MIN_VALUE wraps under negation (-MIN == MIN); the widened
    decimal(20,0) cast must keep it ordered LAST under desc."""
    from ripcurrent_spark.operators.ranking import exact_global_ranks

    vals = [-(2**63), -5, 0, 7, 2**63 - 1, -(2**63), 3]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r.id: r.rank
        for r in exact_global_ranks(
            df, [("v", True), ("id", False)], unique_col="id"
        ).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(W.orderBy(F.desc("v"), "id"))
        ).collect()
    }
    assert got == want


def test_ranking_desc_int_min_value_matches_window(spark):
    from ripcurrent_spark.operators.ranking import exact_global_ranks

    vals = [-(2**31), 4, -(2**31), 2**31 - 1, 0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v int"
    )
    got = {
        r.id: r.rank
        for r in exact_global_ranks(
            df, [("v", True), ("id", False)], unique_col="id"
        ).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(W.orderBy(F.desc("v"), "id"))
        ).collect()
    }
    assert got == want


# ----------------------------------------------------- fused multi-ranking


def test_ranks_multi_matches_window_mirror_and_unpersists(spark):
    """exact_global_ranks_multi must equal chained window row_numbers
    on every order, and must release its internal cache before
    returning (the ADVICE r6 leak class)."""
    from ripcurrent_spark.operators.ranking import exact_global_ranks_multi

    rows = [(i, (i * 7) % 13, ((i * 3) % 5) * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    before = _n_cached(spark)
    out = exact_global_ranks_multi(
        df,
        [
            ([("a", True), ("id", False)], "ra"),
            ([("b", False), ("id", False)], "rb"),
        ],
        unique_col="id",
        n_buckets=8,
        sample_k=64,
        total_col="n",
    )
    got = {r.id: (r.ra, r.rb, r.n) for r in out.collect()}
    assert _n_cached(spark) == before, "multi-rank leaked a cached frame"
    mirror = df.select(
        "id",
        F.row_number().over(W.orderBy(F.desc("a"), "id")).alias("ra"),
        F.row_number().over(W.orderBy("b", "id")).alias("rb"),
    ).collect()
    want = {r.id: (r.ra, r.rb, 200) for r in mirror}
    assert got == want


def test_rfm_segments_leaves_no_cached_frames(spark):
    before = _n_cached(spark)
    q = all_queries()["q_rfm_segments"]
    df = q.spark(spark, "/root/testdata/sf0.001")
    df.collect()
    assert _n_cached(spark) == before


def test_pq_distortion_leaves_no_cached_frames(spark):
    before = _n_cached(spark)
    q = all_queries()["ann_pq_distortion"]
    q.spark(spark, "/root/testdata/sf0.001").collect()
    assert _n_cached(spark) == before


@pytest.mark.parametrize("name", ["ann_kmeans_centroids", "ann_cluster_doc_profile"])
def test_kmeans_family_leaves_no_cached_frames(spark, name):
    """Same r6-ADVICE leak class as rfm/pq: the Lloyd build's eager
    collects justify a persist, but it must release before returning."""
    before = _n_cached(spark)
    all_queries()[name].spark(spark, "/root/testdata/sf0.001").collect()
    assert _n_cached(spark) == before


# ------------------------------------------- degree-ordered triangle census


def _sym_edges(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(both)), "src long, dst long")


def _brute_triangles(pairs):
    import itertools

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    return sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )


def test_triangle_census_planted_hub(spark):
    """VERDICT r6 #2: one node connected to ALL others (the hub whose
    id-oriented adjacency array was unbounded). Degree orientation
    must (a) count identically to brute force and (b) leave the hub
    with out-degree ~0 — every star edge points AT the hub."""
    from ripcurrent_spark.queries.graph import orient_by_degree, triangle_census

    n = 40
    pairs = [(0, i) for i in range(1, n)] + [(1, 2), (3, 4), (5, 6)]
    edges = _sym_edges(spark, pairs)

    row = triangle_census(edges).collect()[0]
    assert row.n_triangles == _brute_triangles(pairs) == 3
    assert row.n_nodes == n
    assert row.n_edges == len(pairs)

    o = orient_by_degree(edges).collect()
    outdeg = {}
    for r in o:
        outdeg[r.u] = outdeg.get(r.u, 0) + 1
    # The hub (degree n-1) is the (deg, id)-largest node: nothing
    # leaves it, everything enters it.
    assert outdeg.get(0, 0) == 0
    assert max(outdeg.values()) <= 2  # triangle leaves have degree 2


def test_triangle_census_matches_id_orientation_counts(spark):
    """Orientation choice must not change the census — compare against
    brute force on a denser random-ish graph with skewed degrees."""
    from ripcurrent_spark.queries.graph import triangle_census

    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * i + 3 * i) % 23, (i * 5 + 1) % 23) for i in range(160)
            )
            if a != b
        }
    )
    row = triangle_census(_sym_edges(spark, pairs)).collect()[0]
    assert row.n_triangles == _brute_triangles(pairs)


# ----------------------------------------------------------- sigstore GC


def test_sigstore_gc_removes_stranded_digests(tmp_path, monkeypatch):
    """ADVICE r6: regenerated source data lands a NEW digest and used
    to strand the old one forever. gc_stranded deletes digests whose
    recorded source fingerprint no longer resolves — and keeps live
    ones (artifacts for DIFFERENT sf dirs coexist, so sibling-deletion
    would thrash; staleness must be proven per digest)."""
    from ripcurrent_spark.operators import sigstore

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_CACHE", str(tmp_path / "cache"))
    kind = tmp_path / "cache" / "somekind"
    kind.mkdir(parents=True)

    src = tmp_path / "live.parquet"
    src.write_bytes(b"x" * 64)
    st = src.stat()

    live = kind / "aaaa"
    live.mkdir()
    (live / "_RC_KEY").write_text(
        json.dumps(
            {"key": "k1", "source": str(src), "size": st.st_size, "mtime_ns": st.st_mtime_ns}
        )
    )
    gone_src = kind / "bbbb"
    gone_src.mkdir()
    (gone_src / "_RC_KEY").write_text(
        json.dumps({"key": "k2", "source": str(tmp_path / "deleted.parquet"), "size": 1, "mtime_ns": 2})
    )
    changed = kind / "cccc"
    changed.mkdir()
    (changed / "_RC_KEY").write_text(
        json.dumps({"key": "k3", "source": str(src), "size": st.st_size + 5, "mtime_ns": st.st_mtime_ns})
    )
    legacy = kind / "dddd"  # pre-v2 dir without a sidecar
    legacy.mkdir()

    removed = sigstore.gc_stranded()
    assert live.exists()
    assert not gone_src.exists() and not changed.exists() and not legacy.exists()
    assert len(removed) == 3


def test_sigstore_build_records_source_and_gcs(spark, tmp_path, monkeypatch):
    """End-to-end: a build writes the _RC_KEY sidecar; regenerating the
    source and rebuilding garbage-collects the superseded digest."""
    from ripcurrent_spark.operators import sigstore

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "t.parquet"

    def land(val):
        spark.createDataFrame([(1, val)], "id long, v string").write.mode(
            "overwrite"
        ).parquet(str(src))
        key = sigstore._source_key(str(tmp_path), "t", "p1")
        return sigstore.materialized(
            spark,
            "k",
            key,
            lambda: spark.read.parquet(str(src)),
            source=src,
        )

    land("a")
    dirs1 = {d.name for d in (tmp_path / "cache" / "k").iterdir()}
    assert len(dirs1) == 1
    digest = (tmp_path / "cache" / "k") / next(iter(dirs1))
    meta = json.loads((digest / "_RC_KEY").read_text())
    assert meta["source"] == str(src.resolve())

    land("b")  # regenerated source -> new digest, old one GC'd
    dirs2 = {d.name for d in (tmp_path / "cache" / "k").iterdir()}
    assert len(dirs2) == 1 and dirs2 != dirs1


# ------------------------------------- gated streaming enrichment broadcast


def test_enrich_foreach_batch_broadcast_is_gated(spark, tmp_path):
    """VERDICT r6 #3: the enrichment dim is the CDC snapshot — a
    source-table-scaled relation. With the gate closed the batch plan
    must carry ZERO BroadcastExchange (mirrors test_plans' closed-gate
    sweep); at bench scale it must still broadcast."""
    from ripcurrent_spark.streaming.pipeline import enrich_foreach_batch

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(50)], "k long, name string"
    ).write.parquet(dim_path)
    batch = spark.createDataFrame([(i % 50, i) for i in range(200)], "k long, v long")

    plans = []
    fn = enrich_foreach_batch(dim_path, "k", lambda df, bid: plans.append(
        df._jdf.queryExecution().executedPlan().toString()
    ))

    fn(batch, 0)  # open gate: dim is tiny -> broadcast plan
    assert "BroadcastHashJoin" in plans[0]

    spark.conf.set("spark.ripcurrent.broadcastGateBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fn(batch, 1)
        assert "BroadcastExchange" not in plans[1]
    finally:
        spark.conf.unset("spark.ripcurrent.broadcastGateBytes")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


# ------------------------------------------------- record-sink layout pin


def test_record_mode_rejects_non_string_payload(spark):
    """The flat-file byte layout is pinned by the all-string payload
    contract; a non-string column must fail fast, not commit Spark's
    internal cast(string) rendering (ADVICE r6)."""
    # The guard lives inline in app.py's record branch (driven e2e by
    # tests/test_app.py, whose plans decode all columns as string);
    # here we pin the detection logic on a frame that VIOLATES the
    # contract, which the e2e path can't produce.
    import pyspark.sql.types as T

    meta_cols = ("op", "ts_ms", "table", "key_field", "key_value")
    masked = spark.createDataFrame(
        [("c", 1, "t", "id", "1", 5)],
        "op string, ts_ms long, table string, key_field string, key_value string, amount long",
    )
    out_cols = [c for c in masked.columns if c not in meta_cols]
    non_string = [
        f.name
        for f in masked.schema.fields
        if f.name in out_cols and not isinstance(f.dataType, T.StringType)
    ]
    assert non_string == ["amount"]


# --------------------------------------------------- sf0.01 value parity

SF001 = "/root/testdata/sf0.01"

REWRITTEN_R7 = [
    "q_pareto_orders",     # tie fix (filter >= instead of >)
    "q_rfm_segments",      # fused multi-rank, zero joins
    "q_gini_revenue",      # ranking desc widening underneath
    "q_spend_percentiles", # ranking desc widening underneath
    "graph_triangle_count",  # degree-ordered orientation + new oracle
    "ann_pq_distortion",   # literal codebooks + unpersist
    "dedup_minhash_lsh",   # sigstore v2 artifact layout canary
]


@pytest.fixture(scope="module")
def ddb001():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF001}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", REWRITTEN_R7)
def test_rewritten_query_parity_at_sf001(spark, ddb001, name):
    q = all_queries()[name]
    assert q.oracle, name
    assert_parity(q.spark(spark, SF001), ddb001.sql(q.oracle), name)
