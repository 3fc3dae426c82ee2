"""Round-8 tests: ADVICE r7 items (sigstore tmp stranding, ranking
suffixed-clash guard, bpe empty-doc counts, consensus release seam via
the registry-wide sweep in test_cache_hygiene.py) and VERDICT r7 items
(production-vocabulary tokenizer posture, consensus-gated corpus
materialization, perceptual-hash image dedup, post-hoc manifest
stamping)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ripcurrent_spark.queries import all_queries

# ------------------------------------------------------- sigstore tmp GC


def test_sigstore_failed_build_sweeps_own_tmp(spark, tmp_path, monkeypatch):
    """ADVICE r7: a build that dies after partially writing its tmp dir
    must not strand it — the post-success sibling sweep never runs on
    the failure path, and a regenerated source lands a NEW digest name
    that would never glob the old tmp."""
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_CACHE", str(tmp_path))
    from ripcurrent_spark.operators import sigstore

    out = sigstore.artifact_dir("tkind", "tkey")

    def bad_build():
        tmp = out.parent / f"{out.name}.tmp.{os.getpid()}"
        tmp.mkdir(parents=True)
        (tmp / "part-00000").write_text("half-written junk")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        sigstore.materialized(spark, "tkind", "tkey", bad_build)
    assert not list(out.parent.glob("*.tmp.*")), "failed build stranded its tmp dir"
    assert not (out / "_SUCCESS").exists()


def test_gc_stranded_ages_out_foreign_tmp(tmp_path):
    """A crashed OTHER-process builder's tmp dir (its finally never
    ran) ages out of the cache after an hour; a fresh one is left for
    the in-flight build that owns it."""
    from ripcurrent_spark.operators.sigstore import gc_stranded

    kind = tmp_path / "somekind"
    old = kind / "abcdef.tmp.12345"
    fresh = kind / "abcdef.tmp.67890"
    for d in (old, fresh):
        d.mkdir(parents=True)
        (d / "part-00000").write_text("x")
    os.utime(old, (0, 0))  # epoch: definitely older than an hour

    removed = gc_stranded(root=tmp_path)
    assert str(old) in removed
    assert not old.exists()
    assert fresh.exists()


# ------------------------------------------------- ranking clash guard


def test_multi_rank_rejects_suffixed_internal_clash(spark):
    """ADVICE r7: the generated columns are index-suffixed (_rk_sk0,
    _rk_bucket0, ...); an input column with exactly that name must be
    rejected, not silently duplicated."""
    from ripcurrent_spark.operators.ranking import exact_global_ranks_multi

    df = spark.range(10).select(
        F.col("id"), F.col("id").alias("v"), F.lit(1).alias("_rk_sk0")
    )
    with pytest.raises(ValueError, match="_rk_sk0"):
        exact_global_ranks_multi(df, [([("v", False)], "r")], unique_col="id")


# ------------------------- production-vocabulary tokenizer posture (r7 #1)


def test_vocab_in_hits_inset_plan(spark):
    """A 10k-entry vocabulary must fold to ONE hashed InSet probe —
    no per-entry plan nodes (the old array_contains form was a linear
    scan per token; chained OR / array_contains would put one node
    per entry in the plan)."""
    from ripcurrent_spark.operators.text import vocab_in_hits

    vocab = [f"tok{i}" for i in range(10_000)]
    df = spark.createDataFrame(
        [(1, ["tok1", "zzz", "tok9999"])], "id long, toks array<string>"
    )
    out = df.select(vocab_in_hits("toks", vocab).alias("n"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("INSET") == 1, "vocabulary membership must be one InSet"
    assert "array_contains" not in plan
    assert [r["n"] for r in out.collect()] == [2]


def test_vocab_coverage_query_uses_inset(spark):
    from ripcurrent_spark.queries import all_queries

    df = all_queries()["text_vocab_coverage"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "INSET" in plan and "array_contains" not in plan


def test_bpe_empty_doc_zero_counts(spark):
    """ADVICE r7: a document whose normalized text is empty must
    report 0/0/0, not the phantom one-empty-token wrap."""
    from ripcurrent_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, ""), (2, "!!! ???"), (3, "batch batch sort merge")],
        "doc_id long, text string",
    )
    merges = [("batch", "batch"), ("batch_batch", "batch"), ("sort", "merge")]
    rows = {r["doc_id"]: r.asDict() for r in TX.apply_bpe(df, merges).collect()}
    for k in (1, 2):
        assert rows[k]["n_tokens_before"] == 0
        assert rows[k]["n_tokens_after"] == 0
        assert rows[k]["n_merges_applied"] == 0
        assert rows[k]["bpe_text"] == ""
    assert rows[3]["bpe_text"] == "batch_batch sort_merge"
    assert rows[3]["n_merges_applied"] == 2


def test_bpe_plan_independent_of_merge_table_size(spark):
    """The merge table lives in the mapInPandas closure: a 10k-entry
    table and a 3-entry table must build the IDENTICAL plan (one
    MapInPandas node, no per-entry anything)."""
    from ripcurrent_spark.operators import text as TX

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    small = TX.apply_bpe(df, [("a", "b")])
    big_merges = [(f"w{i}a", f"w{i}b") for i in range(10_000)]
    big = TX.apply_bpe(df, big_merges, tokenizer=TX.bpe_ranked_merge(big_merges))
    import re

    def norm(df):  # expression IDs differ per plan; strip them
        return re.sub(
            r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString()
        )

    ps, pb = norm(small), norm(big)
    assert ps.count("MapInPandas") == 1
    assert ps == pb, "plan must not scale with the merge table"


def test_bpe_engines_equivalent_on_corpus(spark):
    """chained-replace (oracle default) and ranked-merge (production
    engine) must admit identical outputs over the real corpus."""
    from ripcurrent_spark.io import load
    from ripcurrent_spark.operators import text as TX
    from ripcurrent_spark.queries.text import _BPE_MERGES

    d = load(spark, "/root/testdata/sf0.001", "documents")
    merges = list(_BPE_MERGES)
    a = {r["doc_id"]: tuple(r) for r in TX.apply_bpe(d, merges).collect()}
    b = {
        r["doc_id"]: tuple(r)
        for r in TX.apply_bpe(
            d, merges, tokenizer=TX.bpe_ranked_merge(merges)
        ).collect()
    }
    assert a == b


def test_bpe_engines_equivalence_law():
    """Hypothesis law (pure pandas, no Spark): on any WELL-FORMED
    merge table — operands are base tokens or outputs of earlier
    rules, no duplicate outputs — the chained-replace and
    ranked-merge engines produce identical wrapped strings."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ripcurrent_spark.operators.text import (
        bpe_chained_replace,
        bpe_ranked_merge,
    )

    base = ["a", "b", "c", "d", "e"]

    @st.composite
    def table_and_docs(draw):
        avail = list(base)
        merges, outputs = [], set()
        for _ in range(draw(st.integers(0, 8))):
            l = draw(st.sampled_from(avail))
            r = draw(st.sampled_from(avail))
            out = l + "_" + r
            if (l, r) in merges or out in outputs:
                continue
            merges.append((l, r))
            outputs.add(out)
            avail.append(out)  # later rules may chain on this output
        docs = draw(
            st.lists(st.lists(st.sampled_from(base), max_size=12), max_size=6)
        )
        return merges, docs

    @given(table_and_docs())
    @settings(max_examples=150, deadline=None)
    def law(td):
        merges, docs = td
        wrapped = pd.Series(
            [
                "\x02" + "\x03\x02".join(t) + "\x03" if t else ""
                for t in docs
            ]
        )
        a = bpe_chained_replace(merges)(wrapped)
        b = bpe_ranked_merge(merges)(wrapped)
        assert a.tolist() == b.tolist()

    law()


# ------------------------------- perceptual-hash image dedup (r7 #3)


def test_phash_planted_near_dup(spark):
    """Injected hasher (the codec seam): two 'images' one bit apart
    must pair at hamming 1; a far image must not pair. Exercises the
    band join + Hamming verify with a REAL perceptual-hash geometry
    (the default stub only sees text payloads)."""
    from ripcurrent_spark.multimodal.columns import (
        attach_media,
        phash_media,
        phash_near_dup_pairs,
    )

    planted = {
        b"imgA": (0x12345678, 0x0ABCDEF0),
        b"imgB": (0x12345679, 0x0ABCDEF0),  # 1 bit off imgA
        b"imgC": (0x87654321, 0x7539BDF1),  # far from both
    }

    def hasher(payload: bytes) -> tuple[int, int]:
        return planted[payload]

    df = spark.createDataFrame(
        [(1, "imgA"), (2, "imgB"), (3, "imgC")], "doc_id long, text string"
    )
    h = phash_media(attach_media(df, "doc_id", "text"), hasher=hasher)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(h).collect()
    }
    assert pairs == {(1, 2): 1}


def test_phash_band_join_plan(spark):
    """The candidate join must be an equi-join on the band key (never
    a cartesian product), with the hot-band guard as a broadcast
    anti-join — the SimHash family's plan shape."""
    from ripcurrent_spark.queries import all_queries

    df = all_queries()["mm_phash_dedup"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "bval" in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    from ripcurrent_spark.operators import cachereg

    cachereg.release_tracked()


def test_phash_stub_locality():
    """The stub must be locality-sensitive: one appended word moves a
    long payload only a few bits; unrelated payloads sit near 32 of
    64. (An md5-of-bytes stub fails the first property and never
    exercises the 1..3-Hamming verify band on real data.)"""
    from ripcurrent_spark.multimodal.columns import _phash_stub

    base = ("key agg row scan slow fast table value part hash batch " * 8).strip()
    a = _phash_stub(base.encode())
    b = _phash_stub((base + " extra").encode())
    ham = bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
    assert ham <= 6, f"near payloads too far: {ham}"
    c = _phash_stub(b"completely different payload with other words entirely")
    ham_far = bin(a[0] ^ c[0]).count("1") + bin(a[1] ^ c[1]).count("1")
    assert ham_far > 10, f"far payloads too close: {ham_far}"
    assert _phash_stub(b"") == (0, 0)
    assert _phash_stub(b"abc") == (0, 0)  # <4 chars: no grams


# ------------------- consensus-gated corpus materialization (r7 #4)


def test_apply_consensus_invariants(spark):
    """The provenance frame must be a valid delete manifest: statuses
    partition the corpus, every group keeps exactly one doc (the
    highest-quality one), and no consensus pair survives with both
    ends kept."""
    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    reg = all_queries()
    out = reg["dedup_apply_consensus"].spark(spark, sf).collect()
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r)
    for gid, rows in by_group.items():
        kept = [r for r in rows if r["is_kept"]]
        assert len(kept) == 1, f"group {gid}: {len(kept)} kept"
        best = max(rows, key=lambda r: (r["quality_score"], -r["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]
        for r in rows:
            assert r["keep_id"] == kept[0]["doc_id"]
            assert r["n_group"] == len(rows)
            want = (
                "unique"
                if len(rows) == 1
                else ("kept_best" if r["is_kept"] else "dropped_dup")
            )
            assert r["status"] == want

    kept_ids = {r["doc_id"] for r in out if r["is_kept"]}
    pairs = (
        reg["dedup_consensus_pairs"].spark(spark, sf)
        .filter("consensus")
        .select("id_a", "id_b")
        .collect()
    )
    assert pairs, "fixture has no consensus pairs — invariant test is vacuous"
    both_kept = [
        (p["id_a"], p["id_b"])
        for p in pairs
        if p["id_a"] in kept_ids and p["id_b"] in kept_ids
    ]
    assert not both_kept, f"consensus pairs with both ends kept: {both_kept}"
    cachereg.release_tracked()


def test_phash_batch_fold_matches_stub():
    """The batch-vectorized default path and the per-payload stub are
    the same math — pinned on empty/short/real payloads."""
    from ripcurrent_spark.multimodal.columns import _PH_SEEDS, _phash_stub
    from ripcurrent_spark.operators.dedup import simhash_np_batch_fold

    payloads = [
        b"",
        b"abc",
        b"the quick brown fox jumps over the lazy dog",
        ("key agg row scan slow fast table value part " * 6).encode(),
    ]
    grams = [
        [p.decode()[i : i + 4] for i in range(len(p.decode()) - 3)]
        for p in payloads
    ]
    pa, pb = simhash_np_batch_fold(grams, _PH_SEEDS)
    for i, p in enumerate(payloads):
        assert (pa[i], pb[i]) == _phash_stub(p)


def test_minhash_table_np_matches_expression_chain(spark):
    """The fused grams+signature python pass behind the MinHash
    artifact must be bit-identical to the expression chain it
    replaced (ngrams_of_tokens + array_distinct + minhash_sig_np),
    including gram ORDER (first-occurrence distinct) and the
    drop-empty membership."""
    from pyspark.sql import functions as F

    from ripcurrent_spark.io import load
    from ripcurrent_spark.operators import dedup as DD

    toks = (
        load(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", DD.tokens("text").alias("toks"))
    )
    old = (
        toks.select("doc_id", DD.ngrams_of_tokens(F.col("toks"), n=3).alias("ngs"))
        .filter(F.size("ngs") > 0)
    )
    old = old.join(DD.minhash_sig_np(old, k=12), "doc_id")
    new = DD.minhash_table_np(toks, n=3, k=12)
    o = {r["doc_id"]: (list(r["ngs"]), list(r["sig"])) for r in old.collect()}
    n = {r["doc_id"]: (list(r["ngs"]), list(r["sig"])) for r in new.collect()}
    assert o == n

    # Short/empty docs are dropped identically (tokens('') == ['']).
    tiny = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, "one two three four")],
        "doc_id long, text string",
    ).select("doc_id", DD.tokens("text").alias("toks"))
    out = {r["doc_id"] for r in DD.minhash_table_np(tiny).collect()}
    assert out == {3}


# --------------- containment dedup + temperature source mixing (r8 extras)


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc fully CONTAINED in a long one must surface with
    containment 1.0 even though its jaccard is far below the
    symmetric near-dup gate — the asymmetric case this operator
    exists for."""
    from pyspark.sql import functions as F

    from ripcurrent_spark.operators import dedup as DD

    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long = short + " " + filler
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated words here only")],
        "doc_id long, text string",
    )
    g = (
        df.select("doc_id", DD.tokens("text").alias("toks"))
        .select("doc_id", DD.ngrams_of_tokens(F.col("toks")).alias("ngs"))
        .filter(F.size("ngs") > 0)
    )
    ex = g.select("doc_id", F.explode("ngs").alias("ng"))
    cands = DD.candidate_pairs_by_key(ex, "doc_id", "ng", max_df=100)
    a = g.select(F.col("doc_id").alias("id_a"), F.col("ngs").alias("ngs_a"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("ngs").alias("ngs_b"))
    inter = F.size(F.array_intersect("ngs_a", "ngs_b"))
    v = (
        cands.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / F.least(F.size("ngs_a"), F.size("ngs_b"))).alias("cont"),
            (inter.cast("double") / (F.size("ngs_a") + F.size("ngs_b") - inter)).alias("jac"),
        )
        .collect()
    )
    got = {(r["id_a"], r["id_b"]): (r["cont"], r["jac"]) for r in v}
    cont, jac = got[(1, 2)]
    assert cont == 1.0, "full inclusion must score containment 1.0"
    assert jac < 0.1, "the fixture must be invisible to the jaccard gate"
    assert (1, 3) not in got and (2, 3) not in got


def test_temperature_mix_invariants(spark):
    """Weights form a distribution; rare sources are UPWEIGHTED
    relative to their corpus share (T=2 damping); accepts never
    exceed the source's size."""
    from ripcurrent_spark.queries import all_queries

    rows = (
        all_queries()["sample_temperature_sources"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    total_docs = sum(r["n_docs"] for r in rows)
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 < r["n_sampled"] <= r["n_docs"]
        share = r["n_docs"] / total_docs
        # sqrt damping: mix weight exceeds corpus share iff the source
        # is smaller than the mean-square share — for a near-uniform
        # 20-source corpus just check direction vs share ordering.
        assert r["accept_rate"] > 0
    small = min(rows, key=lambda r: r["n_docs"])
    big = max(rows, key=lambda r: r["n_docs"])
    if small["n_docs"] < big["n_docs"]:
        assert (
            small["mix_weight"] / (small["n_docs"] / total_docs)
            >= big["mix_weight"] / (big["n_docs"] / total_docs)
        ), "temperature must upweight the rarer source relatively"


def test_temperature_mix_any_t(spark):
    """The control-plane operator supports arbitrary T (the registered
    query fixes T=2 for oracle exactness): T=1 reproduces proportional
    sampling, larger T flattens the mix toward uniform, and the accept
    set is deterministic across runs."""
    from ripcurrent_spark.io import load
    from ripcurrent_spark.operators.sampling import (
        temperature_mix,
        temperature_mix_plan,
    )

    d = load(spark, "/root/testdata/sf0.001", "documents")
    cnt = [(r[0], r[1]) for r in d.groupBy("source").count().collect()]
    n_total = sum(n for _, n in cnt)

    p1 = {s: q for s, _, q, _, _ in temperature_mix_plan(cnt, 1.0, 0.25)}
    for s, n in cnt:  # T=1: mix weight == corpus share
        assert abs(p1[s] - n / n_total) < 1e-12
    p5 = {s: q for s, _, q, _, _ in temperature_mix_plan(cnt, 5.0, 0.25)}
    small = min(cnt, key=lambda t: t[1])[0]
    big = max(cnt, key=lambda t: t[1])[0]
    if small != big:
        # Higher T compresses the spread between rare and dominant.
        assert (p5[big] - p5[small]) < (p1[big] - p1[small]) + 1e-12

    a = {r["doc_id"] for r in temperature_mix(d, temperature=3.0).select("doc_id").collect()}
    b = {r["doc_id"] for r in temperature_mix(d, temperature=3.0).select("doc_id").collect()}
    assert a == b and 0 < len(a) < d.count()


def test_mm_keep_one_keeps_largest_payload(spark):
    """The image keep-policy is highest-resolution proxy (largest
    payload), not lowest id — pinned per group, plus manifest
    validity (one kept per group, statuses partition)."""
    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.queries import all_queries

    out = (
        all_queries()["mm_phash_keep_one"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r)
    n_multi = 0
    for gid, rows in by_group.items():
        kept = [r for r in rows if r["is_kept"]]
        assert len(kept) == 1
        best = max(rows, key=lambda r: (r["n_bytes"], -r["media_id"]))
        assert kept[0]["media_id"] == best["media_id"]
        for r in rows:
            want = (
                "unique"
                if len(rows) == 1
                else ("kept_best" if r["is_kept"] else "dropped_dup")
            )
            assert r["status"] == want
        if len(rows) > 1:
            n_multi += 1
    assert n_multi > 0, "fixture has no multi-image clusters"
    cachereg.release_tracked()
