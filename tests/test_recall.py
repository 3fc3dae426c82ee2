"""Recall measurement for the APPROXIMATE paths against planted
ground truth — correctness of an LSH/banding operator isn't just
"hash-matches the oracle", it's "finds the duplicates": these tests
plant known near-dups/neighbors and bound the miss rate.

Precision is 1.0 by construction (every candidate is verified by the
exact metric); recall is the banding gamble being measured.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ripcurrent_spark.operators import dedup as DD
from ripcurrent_spark.operators import similarity as SIM

WORDS = [f"w{i}" for i in range(200)]


def _corpus(n_base=40, n_dup=20, seed=7):
    """Base docs of 30 random words; the first n_dup get a near-dup
    twin with 2 words changed (high jaccard on 3-gram shingles)."""
    rng = random.Random(seed)
    docs = []
    for i in range(n_base):
        words = [rng.choice(WORDS) for _ in range(30)]
        docs.append((i, " ".join(words)))
        if i < n_dup:
            twin = list(words)
            twin[5] = rng.choice(WORDS)
            docs.append((1000 + i, " ".join(twin)))
    return docs, {(i, 1000 + i) for i in range(n_dup)}


def test_minhash_lsh_recall(spark):
    docs, planted = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    g = (
        df.select("doc_id", DD.tokens("text").alias("toks"))
        .select("doc_id", DD.ngrams_of_tokens(F.col("toks")).alias("ngs"))
        .filter(F.size("ngs") > 0)
        .persist()
    )
    sigs = (
        g.select("doc_id", DD.shingle_hashes(F.col("ngs")).alias("hs"))
        .select("doc_id", DD.minhash_from_hashes(F.col("hs"), 12).alias("sig"))
    )
    bk = sigs.select("doc_id", F.explode(DD.lsh_band_keys(F.col("sig"), 4, 3)).alias("bkey"))
    cands = DD.candidate_pairs_by_key(bk, "doc_id", "bkey")
    found = {(r.id_a, r.id_b) for r in cands.collect()}
    hits = planted & found
    recall = len(hits) / len(planted)
    # 2/30 words changed -> jaccard ~0.78; 4 bands x 3 rows at s=0.78
    # gives per-pair catch prob ~0.92 — demand >= 0.7 to stay
    # deterministic-but-honest.
    assert recall >= 0.7, f"LSH recall {recall:.2f} (found {len(hits)}/{len(planted)})"
    # no false "verified" dups: every planted pair really is similar
    ver = {(r.id_a, r.id_b) for r in DD.candidate_pairs_by_key(bk, "doc_id", "bkey")
           .join(g.select(F.col("doc_id").alias("id_a"), F.col("ngs").alias("na")), "id_a")
           .join(g.select(F.col("doc_id").alias("id_b"), F.col("ngs").alias("nb")), "id_b")
           .withColumn("j", F.size(F.array_intersect("na", "nb")) /
                       (F.size("na") + F.size("nb") - F.size(F.array_intersect("na", "nb"))))
           .filter(F.col("j") >= 0.6).select("id_a", "id_b").collect()}
    assert planted & ver == hits  # verification keeps every true planted candidate


def _vectors(n=120, dim=16, seed=3):
    rng = random.Random(seed)
    rows, planted = [], set()
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
        if i < 30:  # planted neighbor: tiny perturbation
            w = [x + rng.gauss(0, 0.01) for x in v]
            rows.append((1000 + i, w))
            planted.add((i, 1000 + i))
    return rows, planted


def test_lsh_ann_recall(spark):
    rows, planted = _vectors()
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    out = SIM.lsh_bucketed_topk(df, n_bits=6, k=3, dim=16)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    hits = {(a, b) for a, b in planted if (a, b) in got or (b, a) in got}
    recall = len(hits) / len(planted)
    # near-identical vectors almost always share all 6 sign bits
    assert recall >= 0.8, f"ANN LSH recall {recall:.2f}"


def test_streaming_dedup_recall_matches_batch(spark, tmp_path):
    """The incremental path plays the same banding gamble as batch
    MinHash-LSH: streaming the corpus in two batches must flag at
    least the planted twins whose band keys collide — i.e. recall no
    worse than the batch candidate generator on the same corpus."""
    from ripcurrent_spark.streaming.dedup import streaming_dedup_foreach_batch

    docs, planted = _corpus()
    base = [(i, t) for i, t in docs if i < 1000]
    twins = [(i, t) for i, t in docs if i >= 1000]

    fn = streaming_dedup_foreach_batch(
        str(tmp_path / "index"), str(tmp_path / "decisions"), threshold=0.7
    )
    fn(spark.createDataFrame(base, "doc_id long, text string"), 0)
    fn(spark.createDataFrame(twins, "doc_id long, text string"), 1)

    dec = {
        r.doc_id: r.dup_of
        for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
        if r.is_duplicate
    }
    stream_hits = {(orig, twin) for twin, orig in dec.items() if (orig, twin) in planted}
    recall = len(stream_hits) / len(planted)
    assert recall >= 0.7, f"streaming recall {recall:.2f}"
    # Base docs were all admitted (no false dups among random docs).
    admitted = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
        if not r.is_duplicate
    }
    assert {i for i, _ in base} <= admitted


def test_streaming_dedup_hot_band_key_capped(spark, tmp_path):
    """A degenerate trigger full of near-identical docs must NOT go
    quadratic in the in-batch peer join: above the per-band-key cap
    each doc compares only against the key's min-id representative
    (star, O(n) candidates) instead of every peer (clique, O(n^2)) —
    and for exactly this degenerate case recall is unchanged, because
    lowest-id-wins would have picked that representative anyway."""
    from ripcurrent_spark.streaming.dedup import (
        band_keyed_signatures,
        in_batch_candidates,
        streaming_dedup_foreach_batch,
    )

    n_hot = 60
    base_words = " ".join(f"w{i}" for i in range(40))
    hot = [(i, base_words) for i in range(n_hot)]          # identical docs
    rng_docs = [(100 + i, " ".join(f"u{i}x{j}" for j in range(40))) for i in range(5)]
    batch = spark.createDataFrame(hot + rng_docs, "doc_id long, text string")

    bk = band_keyed_signatures(batch)
    cap = 8
    n_cands = in_batch_candidates(bk, max_peers_per_band=cap).count()
    bands = 4
    # Star bound: <= (n-1) per hot band key x 4 band keys, plus the
    # tiny cold contribution. The clique would be 4 * C(60,2) = 7080.
    assert n_cands <= bands * (n_hot - 1) + 50, n_cands
    clique = bk.alias("a").join(bk.alias("b"), "bkey").filter("b.doc_id < a.doc_id").count()
    assert clique >= 4 * (n_hot * (n_hot - 1) // 2)  # the blow-up we avoided

    # Recall through the full decision path: everyone dups to doc 0.
    fn = streaming_dedup_foreach_batch(
        str(tmp_path / "idx"), str(tmp_path / "dec"),
        threshold=0.7, max_peers_per_band=cap,
    )
    fn(batch, 0)
    dec = {r.doc_id: (r.is_duplicate, r.dup_of)
           for r in spark.read.parquet(str(tmp_path / "dec")).collect()}
    assert dec[0] == (False, None)                      # canonical survivor
    for i in range(1, n_hot):
        assert dec[i] == (True, 0), f"doc {i}: {dec[i]}"
    for i, _ in rng_docs:
        assert dec[i][0] is False                       # distinct docs admitted
