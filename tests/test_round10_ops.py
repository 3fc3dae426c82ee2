"""Round-10 tests: the components_deployment ambient seam (VERDICT r9
#8), reliable-checkpoint file lifecycle (ADVICE r9), and companions
added this round."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.operators.dedup import (
    components_deployment,
    connected_components,
)
from tests.conftest import SF_ORACLE

# ----------------------------------- components deployment seam


def _rdd_dirs(root):
    return sorted(p for p in root.rglob("rdd-*") if p.is_dir())


def test_components_deployment_reaches_registry_consumer(spark, tmp_path):
    """A cluster deployment must be able to run a bare registry
    consumer (fixed (spark, sf_dir) signature) with reliable
    checkpoints + stats without touching its code: the ambient scope
    threads both kwargs through (VERDICT r9 #8)."""
    from ripcurrent_spark.queries.dedup import dedup_cluster_components

    log: list[dict] = []
    with components_deployment(checkpoint_dir=str(tmp_path), stats_log=log):
        out = dedup_cluster_components(spark, SF_ORACLE)
        rows = out.collect()
    assert rows, "consumer returned nothing"
    assert log and log[0]["converged"] and log[0]["rounds"] >= 1
    # Superseded rounds' files were deleted as the loop ran: only the
    # FINAL round's checkpoint directory remains while the handle
    # lives (ADVICE r9 — no one-directory-per-round accumulation).
    assert len(_rdd_dirs(tmp_path)) == 1
    cachereg.release_tracked()
    assert not _rdd_dirs(tmp_path), "release left checkpoint files behind"


def test_components_restores_caller_checkpoint_dir(spark, tmp_path):
    """connected_components(checkpoint_dir=...) must not clobber a
    caller-set SparkContext checkpoint dir for the rest of the
    process (ADVICE r9)."""
    mine, theirs = tmp_path / "mine", tmp_path / "theirs"
    sc = spark.sparkContext
    sc.setCheckpointDir(str(theirs))
    before = sc._jsc.sc().getCheckpointDir().get()
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = connected_components(pairs, checkpoint_dir=str(mine))
    out.collect()
    cachereg.release_tracked()
    after = sc._jsc.sc().getCheckpointDir().get()
    # The restore re-resolves under the caller's tree (setCheckpointDir
    # nests a fresh uuid), so assert containment, not equality.
    assert before in after or after in before or str(theirs) in after
    assert str(mine) not in after


def test_containment_exclude_exact_bounds_identical_block(spark):
    """VERDICT r9 #7: N mutually-identical docs qualify N(N-1)/2
    containment pairs BY CONTRACT (the quadratic is in the answer) —
    production runs dedup_exact first. exclude_exact=True bakes that
    pre-gate in: a planted 1000-identical-docs block must contribute
    ZERO candidate pairs, while a genuine inclusion of/by the block's
    representative (min id) is still reported."""
    from ripcurrent_spark.operators.dedup import containment_candidates

    ident = [f"w{i} w{i + 1}" for i in range(10)]  # the identical text
    rows = [(i, ident) for i in range(1000)]  # 1000 exact duplicates
    rows.append((5000, ident[:5]))  # genuinely CONTAINED in the block
    rows.append((6000, ["q1 q2", "q2 q3", "q3 q4"]))  # unrelated
    g = spark.createDataFrame(rows, "doc_id long, ngs array<string>")

    got = {
        (r["id_a"], r["id_b"])
        for r in containment_candidates(g, 9, 10, exclude_exact=True).collect()
    }
    intra_block = {p for p in got if p[0] < 1000 and p[1] < 1000}
    assert not intra_block, "identical block leaked intra-block pairs"
    assert (0, 5000) in got, "inclusion vs the representative lost"
    assert len(got) < 10, f"output not bounded: {len(got)} pairs"

    # Flag off on a small slice: the mutual pairs ARE the contract.
    small = spark.createDataFrame(rows[:4], "doc_id long, ngs array<string>")
    assert containment_candidates(small, 9, 10).count() == 6


def test_explicit_kwargs_win_over_ambient(spark, tmp_path):
    exp, amb = tmp_path / "exp", tmp_path / "amb"
    log: list[dict] = []
    mine: dict = {}
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with components_deployment(checkpoint_dir=str(amb), stats_log=log):
        out = connected_components(pairs, checkpoint_dir=str(exp), stats=mine)
        out.collect()
    cachereg.release_tracked()
    assert mine["converged"] and not log, "explicit kwargs must win"
    assert not amb.exists() or not _rdd_dirs(amb)


# ----------------------------------- BPE trainer (VERDICT r9 #5)


def _greedy_bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference rank-priority BPE apply (the bpe_ranked_merge
    discipline, character-level): repeatedly fire the lowest-rank
    applicable merge until none applies."""
    ranks = {m: i for i, m in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        cand = [(ranks[p], p) for p in set(zip(toks, toks[1:])) if p in ranks]
        if not cand:
            break
        _, (a, b) = min(cand)
        out, i = [], 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_train_reproduces_hand_computed_merges(spark):
    """Planted corpus with hand-computable merge sequence: 4x 'abab'
    + 2x 'abc'. Round 1 must merge (a,b) [count 10], round 2 (ab,ab)
    [4], round 3 (ab,c) [2], then the pair space is dry — and the
    trained table, applied greedily, must reproduce the known
    tokenization of a fresh word."""
    from ripcurrent_spark.operators.text import bpe_train

    words = spark.createDataFrame(
        [("abab", 4), ("abc", 2)], "word string, n long"
    )
    rows = bpe_train(words, n_merges=5)
    cachereg.release_tracked()
    got = [(r["round"], r["left_tok"], r["right_tok"], r["merged"], r["n"]) for r in rows]
    assert got == [
        (1, "a", "b", "ab", 10),
        (2, "ab", "ab", "abab", 4),
        (3, "ab", "c", "abc", 2),
    ], got

    merges = [(r["left_tok"], r["right_tok"]) for r in rows]
    assert _greedy_bpe_apply("ababc", merges) == ["abab", "c"]
    assert _greedy_bpe_apply("abababab", merges) == ["abab", "abab"]
    assert _greedy_bpe_apply("xbc", merges) == ["x", "b", "c"]
