"""Driver-gate rotation: registry iteration order is DERIVED from the
committed CORRECTNESS_r*.json artifacts (least-recently-driver-verified
first), not hand-picked. These tests pin the property that matters:
every query with no driver row in any recorded round falls inside the
gate's sampling window, so the external check cannot miss it again."""

from __future__ import annotations

from ripcurrent_spark.queries import (
    GATE_WINDOW,
    all_queries,
    correctness_rounds,
    driver_check_order,
)

# The 16 queries VERDICT r2 called out as never driver-checked; kept
# literal so a regression in the artifact parsing (e.g. files not
# found -> everything reads "never checked") can't silently pass.
NEVER_CHECKED_AFTER_R2 = {
    "ann_kmeans_centroids",
    "emb_covariance",
    "ann_cluster_purity",
    "q_ewma_user_value",
    "q_key_skew_profile",
    "q_countmin_user_counts",
    "q_profile_customer",
    "q_hist_acctbal",
    "dedup_canonical_map",
    "q4_order_priority",
    "q12_priority_by_status",
    "q13_order_count_histogram",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_filter",
    "q20_suppliers_of_hot_parts",
}


def test_artifacts_actually_parsed():
    seen = correctness_rounds()
    assert len(seen) >= 90  # r1+r2 union covered 92 queries
    assert max(seen.values()) >= 2  # r2 artifact read


def test_never_checked_queries_lead_the_window():
    reg = all_queries()
    seen = correctness_rounds()
    never = [n for n in reg if n not in seen]
    window = list(reg)[:GATE_WINDOW]
    missing = set(never) - set(window)
    assert not missing, f"never-driver-checked queries outside gate window: {missing}"
    # They lead it: the first len(never) slots are exactly the
    # never-checked set (stable sort puts round-0 first).
    assert set(window[: len(never)]) == set(never)


def test_verdict_r2_sixteen_in_window():
    window = set(list(all_queries())[:GATE_WINDOW])
    seen = correctness_rounds()
    # Once a later round's artifact lands, these stop being
    # "never checked" and legitimately rotate out — only enforce
    # while the artifact set still says they're unchecked.
    still_unchecked = NEVER_CHECKED_AFTER_R2 - set(seen)
    assert still_unchecked <= window


def _changed_since_verified() -> set[str]:
    from ripcurrent_spark.queries import (
        oracle_value_hash,
        query_source_hash,
        source_manifest,
    )

    reg, seen, man = all_queries(), correctness_rounds(), source_manifest()
    out = set()
    for n, q in reg.items():
        r = seen.get(n, 0)
        if r == 0:
            continue
        ent = man.get(n)
        if (
            not ent
            or ent.get("round", 1 << 30) > r
            or query_source_hash(q.spark) != ent.get("hash")
            or (
                ent.get("oracle_hash") is not None
                and oracle_value_hash(n) != ent.get("oracle_hash")
            )
        ):
            out.add(n)
    return out


def test_rotation_is_diff_aware():
    """VERDICT r6 #1: queries whose registered-function source changed
    since their latest driver row jump the queue — never-checked
    first, then ALL changed (oldest row first), then unchanged
    (oldest row first)."""
    seen = correctness_rounds()
    changed = _changed_since_verified()
    order = driver_check_order(list(all_queries()))

    def group(n):
        if seen.get(n, 0) == 0:
            return 0
        return 1 if n in changed else 2

    keys = [(group(n), seen.get(n, 0)) for n in order]
    assert keys == sorted(keys), "order violates (never, changed, unchanged)+round"


def test_changed_queries_lead_the_window():
    seen = correctness_rounds()
    changed = _changed_since_verified()
    never = {n for n in all_queries() if n not in seen}
    window = set(list(all_queries())[:GATE_WINDOW])
    overflow = (changed | never) - window
    # Every changed/never query fits in the window as long as there is
    # room; if they ever exceed the window the FRONT must still be all
    # changed/never.
    if overflow:
        head = list(all_queries())[:GATE_WINDOW]
        assert all(n in changed or n in never for n in head)
    else:
        assert (changed | never) <= window


def test_manifest_covers_every_verified_query():
    """The bootstrap resolved all 169 queries from git history; a
    future round-end refresh must not drop coverage for queries with
    driver rows (an uncovered query silently counts as changed every
    round, pinning the rotation)."""
    from ripcurrent_spark.queries import source_manifest

    man = source_manifest()
    seen = correctness_rounds()
    uncovered = set(seen) - set(man)
    assert not uncovered, f"verified queries missing manifest entries: {uncovered}"


def test_untracked_artifact_is_ignored():
    """VERDICT r9 #1: the driver's artifact lands in the working tree
    AFTER the round's final commit, so an untracked CORRECTNESS file
    must never influence rotation or red the manifest test at judge
    time. Pin it by planting one."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    plant = root / "CORRECTNESS_r98.json"
    assert not plant.exists()
    plant.write_text(json.dumps({"__planted_query__": {"hash_match": True}}))
    try:
        seen = correctness_rounds()
        assert "__planted_query__" not in seen
        assert max(seen.values()) < 98
    finally:
        plant.unlink()


def test_order_is_complete_and_duplicate_free():
    reg = all_queries()
    order = list(reg)
    assert len(order) == len(set(order))
    from ripcurrent_spark.queries import REGISTRY

    assert set(order) == set(REGISTRY)


def test_manifest_rounds_derive_from_artifacts():
    """VERDICT r7 #5: every manifest stamp must be backed by an ACTUAL
    green driver row — (name, round) pairs are a subset of the round's
    committed CORRECTNESS artifact keys. The pre-r8 predict-the-window
    mode could stamp rows that never happened; the --from-artifact
    derivation cannot."""
    import json
    from pathlib import Path

    from ripcurrent_spark.queries import source_manifest

    root = Path(__file__).resolve().parents[1]
    man = source_manifest()
    arts: dict[int, dict] = {}
    bad = []
    for name, ent in man.items():
        rnd = ent["round"]
        if rnd not in arts:
            p = root / f"CORRECTNESS_r{rnd:02d}.json"
            arts[rnd] = json.loads(p.read_text()) if p.exists() else {}
        row = arts[rnd].get(name)
        if row is None:
            bad.append((name, rnd))
            continue
        if row.get("err") == "no_oracle":  # rows-only row, by design
            if row.get("spark_rows") is None:
                bad.append((name, rnd))
            continue
        if row.get("err"):
            bad.append((name, rnd))
            continue
        checks = [v for k, v in row.items() if k.endswith("_match") and v is not None]
        if not (checks and all(checks)):
            bad.append((name, rnd))
    assert not bad, f"manifest stamps without a green driver row: {bad}"


def test_stale_oracle_hash_marks_query_changed(monkeypatch):
    """r11: a computed-oracle rewrite (helper changed, function source
    identical) must still jump the queue — the manifest's oracle_hash
    records the verified oracle VALUE, and a mismatch sorts the query
    into the changed group."""
    import ripcurrent_spark.queries as Q

    reg = all_queries()
    seen = correctness_rounds()
    # Pick a verified query whose current source matches its manifest
    # entry (i.e. currently "unchanged").
    man = Q.source_manifest()
    name = next(
        n
        for n in reg
        if seen.get(n, 0) > 0
        and man.get(n)
        and man[n].get("round", 1 << 30) <= seen[n]
        and Q.query_source_hash(reg[n].spark) == man[n]["hash"]
    )
    def unchanged_positions(order, manifest):
        return [
            order.index(n)
            for n in order
            if seen.get(n, 0) > 0
            and n != name
            and manifest.get(n)
            and manifest[n].get("round", 1 << 30) <= seen[n]
            and Q.query_source_hash(reg[n].spark) == manifest[n]["hash"]
            and (
                manifest[n].get("oracle_hash") is None
                or Q.oracle_value_hash(n) == manifest[n]["oracle_hash"]
            )
        ]

    planted = dict(man)
    planted[name] = {**man[name], "oracle_hash": "not-the-real-hash"}
    monkeypatch.setattr(Q, "source_manifest", lambda: planted)
    order = Q.driver_check_order(list(reg))
    # The planted query sorts with the CHANGED group: ahead of every
    # unchanged query.
    assert order.index(name) < min(unchanged_positions(order, planted))
    # With a MATCHING oracle_hash the entry is a behavioral no-op:
    # the order is identical to the original manifest's.
    planted[name] = {**man[name], "oracle_hash": Q.oracle_value_hash(name)}
    order2 = Q.driver_check_order(list(reg))
    monkeypatch.setattr(Q, "source_manifest", lambda: man)
    assert order2 == Q.driver_check_order(list(reg))
