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


def test_rotation_prefers_older_rounds():
    seen = correctness_rounds()
    order = driver_check_order(list(all_queries()))
    ranks = [seen.get(n, 0) for n in order]
    assert ranks == sorted(ranks)  # non-decreasing: oldest-first


def test_order_is_complete_and_duplicate_free():
    reg = all_queries()
    order = list(reg)
    assert len(order) == len(set(order))
    from ripcurrent_spark.queries import REGISTRY

    assert set(order) == set(REGISTRY)
