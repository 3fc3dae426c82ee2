"""Round-9 tests: diameter-independent connected components with
loud-on-truncation (VERDICT r8 #2, ADVICE mediums), the reliable
checkpoint seam (VERDICT r8 #8), and companions added this round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.operators.dedup import (
    ComponentsDidNotConverge,
    connected_components,
)

# ------------------------------------------ connected components


def _chain_pairs(spark, n):
    """A single path 0-1-2-...-n-1: diameter n-1, worst case for plain
    min-label propagation (needs n-1 rounds; shortcutting needs
    O(log n))."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )


def test_components_chain_100_converges_logarithmically(spark):
    """A planted diameter-99 chain — the shape the old per-round
    min-label loop could not finish inside its cap (the sf1 pHash
    graph hit diameter 22 of a 50-round budget; chains grow with
    corpus size). Pointer shortcutting must label the whole chain 0
    in O(log n) rounds."""
    stats = {}
    out = connected_components(_chain_pairs(spark, 100), stats=stats)
    rows = out.collect()
    cachereg.release_tracked()
    assert len(rows) == 100
    assert {r["component"] for r in rows} == {0}
    assert stats["converged"]
    assert stats["rounds"] <= 10, f"expected O(log n) rounds, got {stats['rounds']}"


def test_components_truncation_raises_not_silent(spark):
    """Exhausting max_iter with changes pending must RAISE — returning
    split components silently was this round's named correctness
    hazard (under-deletion no oracle catches)."""
    with pytest.raises(ComponentsDidNotConverge):
        connected_components(_chain_pairs(spark, 64), max_iter=2)
    cachereg.release_tracked()


def test_components_multi_component_correctness(spark):
    """Several components of different shapes in one graph: a
    triangle, a star, a 2-chain, an isolated edge — every node gets
    its component's min id."""
    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),          # triangle -> 1
            (10, 11), (10, 12), (10, 13),    # star -> 10
            (20, 21), (21, 22),              # chain -> 20
            (30, 31),                        # edge -> 30
        ],
        "id_a long, id_b long",
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    cachereg.release_tracked()
    want = {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20), (22, 20),
        (30, 30), (31, 30),
    }
    assert got == want


def test_components_reliable_checkpoint_seam(spark, tmp_path):
    """VERDICT r8 #8: checkpoint_dir= switches the per-round cut to
    reliable df.checkpoint() storage. Same labels, and the directory
    actually receives checkpoint data."""
    ckpt = tmp_path / "ckpt"
    stats = {}
    out = connected_components(
        _chain_pairs(spark, 40), checkpoint_dir=str(ckpt), stats=stats
    )
    rows = out.collect()
    cachereg.release_tracked()
    assert {r["component"] for r in rows} == {0}
    assert stats["converged"]
    written = list(ckpt.rglob("*"))
    assert written, "reliable checkpoint dir stayed empty"


# ------------------------------------------ containment recall


def test_containment_finds_widely_syndicated_snippet(spark):
    """VERDICT r8 #3: a short snippet included verbatim in MANY long
    docs makes every one of its own shingles globally hot — the old
    max-df-capped index dropped all its keys and recall went to ZERO
    on exactly the workload the operator exists for. The rarest-prefix
    candidates must surface every (snippet, host) pair."""
    from ripcurrent_spark.operators.dedup import containment_candidates

    n_hosts = 300  # far past the old _MAX_DF=100 cap
    snippet = [f"s{i} s{i + 1} s{i + 2}" for i in range(8)]  # 8 shingles
    rows = [(0, snippet)]
    for h in range(1, n_hosts + 1):
        # each host embeds the snippet plus its own unique filler
        filler = [f"h{h}w{j}" for j in range(40)]
        rows.append((h, snippet + filler))
    g = spark.createDataFrame(rows, "doc_id long, ngs array<string>")
    cands = containment_candidates(g, 9, 10)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    want = {(0, h) for h in range(1, n_hosts + 1)}
    missing = want - got
    assert not missing, f"recall hole: {len(missing)} snippet-host pairs missed"


def test_containment_prefix_bounds_candidates(spark):
    """The flip side of guaranteed recall: unrelated docs sharing
    nothing must produce no candidates, and near-miss pairs (below
    threshold) may appear as candidates but are cheap — the exact
    verify downstream filters them. Here: two disjoint docs -> no
    pair."""
    from ripcurrent_spark.operators.dedup import containment_candidates

    g = spark.createDataFrame(
        [(1, ["a b c", "b c d"]), (2, ["x y z", "y z w"])],
        "doc_id long, ngs array<string>",
    )
    assert containment_candidates(g, 9, 10).count() == 0


def test_containment_recall_law_randomized(spark):
    """The pigeonhole recall guarantee, checked against brute force on
    a seeded random corpus: EVERY pair with overlap coefficient >= 0.9
    must appear among the rarest-prefix candidates — including pairs
    built from the hottest shingles in the corpus."""
    import random

    from ripcurrent_spark.operators.dedup import containment_candidates

    rng = random.Random(99)
    vocab = [f"v{i}" for i in range(30)]  # tiny vocab -> hot shingles
    docs = []
    for i in range(120):
        n = rng.randint(3, 25)
        docs.append((i, sorted(rng.sample(vocab, n))))
    # plant explicit inclusions: doc 200+j = subset of doc j
    for j in range(10):
        base = docs[j][1]
        docs.append((200 + j, base[: max(3, len(base) // 2)]))
    g = spark.createDataFrame(docs, "doc_id long, ngs array<string>")

    by_id = {d: set(s) for d, s in docs}
    want = set()
    ids = sorted(by_id)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = by_id[ids[x]], by_id[ids[y]]
            inter = len(a & b)
            if inter and inter / min(len(a), len(b)) >= 0.9:
                want.add((ids[x], ids[y]))
    got = {(r["id_a"], r["id_b"]) for r in containment_candidates(g, 9, 10).collect()}
    missing = want - got
    assert not missing, f"recall law violated: {sorted(missing)[:5]} missing"


# ------------------------------------------ plan-shape pins (r9 queries)


def _plan(spark, name, sf="/root/testdata/sf0.001"):
    from ripcurrent_spark.queries import all_queries

    df = all_queries()[name].spark(spark, sf)
    s = df._jdf.queryExecution().executedPlan().toString()
    from ripcurrent_spark.operators import cachereg

    cachereg.release_tracked()
    return s


def test_dsir_plan_broadcasts_models(spark):
    """The two feature models are 512-row frames: they must come back
    as broadcasts, never a shuffle join against the corpus-sized
    (doc,bucket) frame; the bucket counting is ONE Arrow pass."""
    p = _plan(spark, "curation_dsir_weights")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # models broadcast, nothing corpus-joins
    assert "BroadcastHashJoin" in p
    # The Arrow pass runs once behind the persist barrier: every
    # reference reads the cache (plan strings repeat the cached
    # subtree, so count InMemoryTableScan, not MapInPandas).
    assert "InMemoryTableScan" in p


def test_rrf_plan_no_cartesian(spark):
    p = _plan(spark, "search_rrf_fusion")
    assert "CartesianProduct" not in p


def test_pq_adc_plan_broadcast_luts(spark):
    """ADC's whole point: the corpus side is the code table; both
    8-row LUTs join as broadcasts."""
    p = _plan(spark, "ann_pq_adc_topk")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_containment_plan_equijoin_only(spark):
    """Prefix x postings candidates are an equi-join on the shingle —
    never a cartesian."""
    p = _plan(spark, "dedup_containment_pairs")
    assert "CartesianProduct" not in p


def test_ks_plan_aggregates_before_window(spark):
    """The global-ORDER window must consume the VALUE-sized ECDF
    frame: corpus rows are aggregated away before any Window node
    (at 100 TB a corpus-sized single-partition window is a stall)."""
    from ripcurrent_spark.queries import all_queries

    df = all_queries()["q_ks_length_drift"].spark(spark, "/root/testdata/sf0.001")
    # Walk the Window's subtree: it must contain an aggregate below it.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    w_idx = plan.index("Window")
    below = plan[w_idx:]
    assert "HashAggregate" in below, "window consumes un-aggregated corpus rows"


# ------------------------------------------ registry count pinning


def test_readme_and_survey_counts_match_live_registry():
    """VERDICT r8 #7: the published registry counts drifted twice
    (r7: 177 vs 178; r8: 181 vs 182). Pin them to the live registry
    so any new query that forgets the doc update fails here."""
    import re
    from pathlib import Path

    from ripcurrent_spark.queries import all_queries

    qs = all_queries()
    n_entries, n_oracles = len(qs), sum(1 for q in qs.values() if q.oracle)
    want = f"({n_entries} entries, {n_oracles}"
    root = Path(__file__).resolve().parent.parent
    for doc in ("README.md", "SURVEY.md"):
        text = (root / doc).read_text()
        stale = re.findall(r"\((\d+) entries, (\d+)\b", text)
        assert stale, f"{doc} lost its registry-count line"
        for ent, orc in stale:
            assert (int(ent), int(orc)) == (n_entries, n_oracles), (
                f"{doc} says ({ent} entries, {orc} oracles); live registry is "
                f"{want} — update the doc alongside the new query"
            )


# ------------------------------------------ temperature mixing (T=3)


def test_temperature_mix_plan_monotone_in_temperature():
    """VERDICT r8 #5 property: raising T flattens the mix, so the
    RAREST source's mix weight and accept rate are non-decreasing in
    T (q_min = 1/sum (p_j/p_min)^(1/T); every ratio >= 1 shrinks as T
    grows). Hypothesis sweeps count vectors and temperature pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ripcurrent_spark.operators.sampling import temperature_mix_plan

    @settings(max_examples=200, deadline=None)
    @given(
        counts=st.lists(st.integers(1, 10**9), min_size=2, max_size=12),
        t1=st.floats(1.0, 50.0, allow_nan=False),
        dt=st.floats(0.1, 50.0, allow_nan=False),
    )
    def prop(counts, t1, dt):
        named = [(f"s{i}", n) for i, n in enumerate(counts)]
        lo = temperature_mix_plan(named, t1, 0.25)
        hi = temperature_mix_plan(named, t1 + dt, 0.25)
        rare = min(counts)
        i = counts.index(rare)
        assert hi[i][2] >= lo[i][2] - 1e-12  # mix weight q
        assert hi[i][3] >= lo[i][3] - 1e-12  # accept rate r

    prop()


def test_temperature_t3_exact_on_perfect_cube_counts(spark, tmp_path):
    """Adversarial exactness probe for the icbrt correction window:
    perfect-cube source counts put cbrt(n * 10^27) EXACTLY on an
    integer, where a 1-ulp-low libm cbrt floors to k-1 on one engine
    and k on the other — the +-2 integer-cube snap must collapse both
    to the true floor, keeping the oracle hash-exact."""
    import duckdb

    from ripcurrent_spark.queries import all_queries
    from tests.parity import assert_parity

    rows = []
    doc = 0
    for si, n in enumerate([8, 27, 64, 125, 1000]):  # perfect cubes
        for _ in range(n):
            rows.append((doc, f"text {doc}", "en", f"cube{si}", 10))
            doc += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = all_queries()["sample_temperature_t3"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    assert_parity(q.spark(spark, str(tmp_path)), con.sql(q.oracle), "t3_cubes")
    con.close()


# ------------------------------------------ vocab IN-list hygiene


def test_vocab_in_hits_escapes_and_empty(spark):
    """ADVICE r8: parser-significant bytes in vocab entries must
    survive the generated-SQL round trip — backslashes (Spark treats
    \\ as an escape in string literals) and quotes (the old ''
    doubling parsed as TWO adjacent literals that Spark concatenates,
    silently dropping the quote). An empty vocab is 0 hits, not the
    'x IN ()' parse error."""
    from ripcurrent_spark.operators.text import vocab_in_hits

    df = spark.createDataFrame(
        [(["a\\b", "it's", "plain", "nope"],)], "toks array<string>"
    )
    got = df.select(
        vocab_in_hits("toks", ["a\\b", "it's", "plain"]).alias("hits"),
        vocab_in_hits("toks", []).alias("none"),
    ).first()
    assert got["hits"] == 3
    assert got["none"] == 0


def test_components_stats_rounds_beat_diameter(spark):
    """Direct comparison on one graph: the chain of 33 needs 32 plain
    propagation rounds; the shortcutting loop must finish well under
    that (and under the default cap with huge headroom)."""
    stats = {}
    connected_components(_chain_pairs(spark, 33), stats=stats).collect()
    cachereg.release_tracked()
    assert stats["rounds"] < 12
