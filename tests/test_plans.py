"""Physical-plan assertions: the scale contract.

Correctness says the operator works at sf0.001; these say the PLAN
still works at 100 TB — filters reach the parquet scan, dims
broadcast, masking stays in whole-stage codegen with zero Python, and
no candidate-generation path degenerates into a cartesian product.
"""

from __future__ import annotations

import pytest

from ripcurrent_spark.queries import all_queries
from tests.conftest import SF_ORACLE

QUERIES = all_queries()


def _plan(spark, name: str) -> str:
    df = QUERIES[name].spark(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filter_pushdown(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_discount" in plan.split("PushedFilters")[1][:200]


def test_q6_column_pruning(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # Only the 4 needed columns scanned, not the full lineitem width.
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier"])
def test_dim_joins_broadcast(spark, name):
    assert "BroadcastHashJoin" in _plan(spark, name)


def test_masking_no_python_udf(spark):
    plan = _plan(spark, "masked_replica_customer")
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
    assert "*(1) Project" in plan  # '*' prefix = whole-stage codegen


@pytest.mark.parametrize(
    "name",
    ["dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash_pairs", "ann_lsh_topk"],
)
def test_candidate_joins_not_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan


def test_ann_brute_force_vectorized_no_join(spark):
    # Query matrix ships inside the mapInPandas closure (its own form
    # of broadcast); the corpus is scored in Arrow batches — no join,
    # no cartesian product in the plan.
    plan = _plan(spark, "ann_cosine_topk")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    # The bounded range join must plan as an equi-join on
    # (key, bucket) — a BroadcastNestedLoopJoin/cartesian on the raw
    # range predicate is exactly the shape that dies at scale.
    plan = _plan(spark, "q_range_join_click_purchase")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_scans_raw_once(spark):
    # The daily tier re-aggregates hourly partials: both union branches
    # must read the SAME cached hourly relation (raw events scanned
    # once at runtime; toString prints the shared cached plan under
    # each InMemoryTableScan reference).
    plan = _plan(spark, "q_hour_day_rollup")
    assert plan.count("InMemoryTableScan") == 2
    assert plan.count("InMemoryRelation") == 2  # same relation, 2 prints


def test_hash_sampling_no_shuffle_single_scan(spark):
    # Deterministic sampling is a pure scan predicate: no Exchange.
    plan = _plan(spark, "sample_hash_docs")
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_cdc_snapshot_single_shuffle(spark):
    plan = _plan(spark, "cdc_latest_snapshot")
    # one Exchange for the key window; AQE may add shuffle reads, so
    # count only shuffle writes
    assert plan.count("Exchange hashpartitioning") <= 2


def test_streaming_masked_plan_no_python(spark):
    from ripcurrent_spark.classify.library import ColumnClassification
    from ripcurrent_spark.cdc.envelope import parse_envelope
    from ripcurrent_spark.rules.model import Rule, RulesLibrary
    from ripcurrent_spark.streaming.pipeline import masked_cdc_stream

    df = spark.createDataFrame([("k", "v")], "key string, value string")
    rules = RulesLibrary().add("up", Rule("Expression", "toupper(${FIELDNAME})"))
    cc = [ColumnClassification("name", "X", "up", 1.0, True)]
    out = masked_cdc_stream(parse_envelope(df), [("name", "string")], cc, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_q1_map_side_partial_aggregation(spark):
    # The 8-agg groupBy must combine map-side before the exchange —
    # at 100 TB the shuffle carries (flag, status) partials, not rows.
    plan = _plan(spark, "q1_pricing_summary")
    assert "partial_sum" in plan or "partial_count" in plan


def test_funnel_single_conditional_agg_pass(spark):
    # n-stage funnel = one groupBy over users + one global agg; a
    # per-stage self-join shape would show multiple joins here.
    plan = _plan(spark, "q_funnel_conversion")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_decontaminate_bench_set_broadcasts(spark):
    # The eval-set gram index must broadcast (it is small by
    # definition); a shuffled membership join would move the whole
    # corpus's exploded grams twice.
    plan = _plan(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_repetition_quality_no_python(spark):
    # Array stats are per-row JVM expressions; only the top-token
    # multiplicity aggregates. Zero Python in the plan.
    plan = _plan(spark, "text_repetition_quality")
    assert "Python" not in plan


def test_pack_sequences_window_is_bucket_partitioned(spark):
    # The packing window must partition by the hash-bucket shard —
    # a global (empty-partition) window would serialize the corpus
    # through one task.
    plan = _plan(spark, "pack_sequences")
    assert "Window" in plan
    assert "hashpartitioning(bucket" in plan


def test_domain_mix_rates_broadcast(spark):
    # Per-language keep rates are a 5-row aggregate joined back
    # against the corpus: must broadcast, and the keep decision is a
    # post-join filter (no extra corpus shuffle).
    plan = _plan(spark, "sample_domain_mix")
    assert "BroadcastHashJoin" in plan


def test_profile_single_scan_single_agg(spark):
    # All columns' stats ride ONE scan + one aggregate; a per-column
    # job shape would show multiple scans here.
    plan = _plan(spark, "q_profile_customer")
    assert plan.count("Scan parquet") == 1
    assert "Python" not in plan


def test_countmin_partial_aggregation(spark):
    # The sketch build must map-side combine: the shuffle carries
    # (row, bucket) partial counts, not raw events.
    plan = _plan(spark, "q_countmin_user_counts")
    assert "partial_count" in plan


def test_char_entropy_zero_shuffle(spark):
    # The entropy claim: fixed-alphabet counts are scan-side
    # expressions — no Exchange anywhere in the plan.
    plan = _plan(spark, "text_char_entropy")
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_bm25_stats_broadcast_back(spark):
    # Corpus stats reduce to one row and come back via a broadcast
    # (nested-loop on a 1-row side), never a shuffled join.
    plan = _plan(spark, "text_bm25_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_build_partial_bitor(spark):
    # The bloom build must map-side combine: partitions collapse to
    # <= 32 (word, bits) partials before the merge shuffle.
    plan = _plan(spark, "q_bloom_membership")
    assert "partial_bit_or" in plan or "partial_bitor" in plan.lower()


def test_mad_group_stats_broadcast(spark):
    # Per-group medians/MADs are tiny frames joined back broadcast;
    # the big side never shuffles for the join.
    plan = _plan(spark, "q_mad_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_no_cartesian_edges_cogrouped(spark):
    # The co-purchase self-join must be an equi-join on l_orderkey, and
    # three unrolled iterations must not degenerate into a cartesian.
    plan = _plan(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_df_side_broadcast(spark):
    # Bounded-vocabulary df frame joins back broadcast (shuffle join +
    # salting is the web-vocab variant; here the hint must hold).
    plan = _plan(spark, "text_tfidf_topk")
    assert "BroadcastHashJoin" in plan


def test_common_spans_no_python_no_cartesian(spark):
    plan = _plan(spark, "dedup_common_spans")
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_luhn_zero_shuffle_codegen(spark):
    # The unrolled 16-term Luhn fold is a pure scan-side projection:
    # no exchange at all, and it stays inside whole-stage codegen.
    plan = _plan(spark, "mask_luhn_cards")
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "*(1)" in plan


def test_snapshot_asof_cutoff_pushed_to_scan(spark):
    # The ts cutoff must reach the parquet scan (on the synthetic
    # changelog it lands as a filter below the window's one exchange).
    plan = _plan(spark, "cdc_snapshot_asof")
    assert plan.count("Exchange hashpartitioning") <= 2  # window shuffle only (union branches)


def test_ivf_assignment_vectorized_not_crossjoined(spark):
    # The coarse quantizer must be the Arrow-batched matmul, not the
    # interpreted crossJoin-per-centroid plan the sf1 sweep killed.
    plan = _plan(spark, "ann_ivf_topk")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_lsh_topk_scored_per_bucket_group(spark):
    # Dense buckets score as grouped numpy blocks (applyInPandas);
    # no all-pairs join survives in the plan.
    plan = _plan(spark, "ann_lsh_topk")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_minhash_reads_signature_artifact(spark):
    # Signatures come from the materialized sigstore artifact (the
    # vectorized MapInPandas pass runs ONCE at artifact build, not
    # per query): the query's own plan is parquet scans of the
    # artifact + the band join — no Python boundary, no cartesian.
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "minhash_sigs" in plan
    assert "MapInPandas" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_cosine_capped_sharded(spark):
    """r4 shape: scoring runs as grouped Arrow blocks over the
    (label, shard) union frame — no per-pair join, no cartesian; the
    capped index id-set joins back via broadcast."""
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # idx_ids set joins broadcast


def test_simhash_pairs_hot_bands_anti_joined(spark):
    """r4 cap: candidate generation excludes hot band values via a
    broadcast ANTI join (the tiny-hot-set side is the broadcastable
    one at any corpus size)."""
    for name in ("dedup_simhash_pairs", "dedup_levenshtein_pairs"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, name
        assert "CartesianProduct" not in plan, name


def test_kmeans_assignment_vectorized(spark):
    """r4: Lloyd assignment is Arrow-batched (MapInPandas), not the
    interpreted HOF crossJoin+window argmin."""
    plan = _plan(spark, "ann_kmeans_centroids")
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "Window" not in plan


def test_bottomk_sample_is_partial_topk(spark):
    """The KMV sample must execute as TakeOrderedAndProject (mergeable
    per-partition bottom-k), never a global Sort of the corpus."""
    plan = _plan(spark, "q_bottomk_sample_quantiles")
    assert "TakeOrderedAndProject" in plan


def test_weighted_reservoir_is_partial_topk(spark):
    plan = _plan(spark, "sample_weighted_reservoir")
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------- round 5
# The quantile family's 100 TB contract: no single-task full-column
# exact-percentile aggregation buffer anywhere (r4 VERDICT's one
# `weak`). Bounds/medians come from mergeable bottom-k samples.


def test_equidepth_bounds_are_partial_topk(spark):
    """q_hist_equidepth's first pass: the bound sample must execute as
    TakeOrderedAndProject (per-partition partial top-k), never a
    global Sort, and the returned bucketing scan must not re-run any
    percentile aggregate over the corpus."""
    from pyspark.sql import functions as F

    from ripcurrent_spark.io import load
    from ripcurrent_spark.queries.curation import _ed_sample

    o = load(spark, SF_ORACLE, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    splan = _ed_sample(o)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan
    full = _plan(spark, "q_hist_equidepth")
    assert "percentile" not in full


def test_mad_medians_from_sharded_sample(spark):
    """q_mad_outliers: both percentile aggregates must consume the
    sharded two-phase bottom-k sample (grouped_bottomk's _bk_shard
    phase-1 window present), and the 5-row stats broadcast back."""
    plan = _plan(spark, "q_mad_outliers")
    assert "_bk_shard" in plan  # phase-1 (group, shard) window ran
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantile_sketch_groups_sharded_sample(spark):
    plan = _plan(spark, "q_quantile_sketch_groups")
    assert "_bk_shard" in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_reads_cell_artifact_no_cartesian(spark):
    """ann_ivfpq_topk: the coarse assignment comes from the warm
    ivf_cells artifact (a parquet scan — the corpus x sqrt(N) compute
    is paid once per corpus digest inside the artifact build, which
    is Arrow-batch assign_np, spread + centroid-chunked), LUT/cell
    joins broadcast, nothing cartesian — the prune must not cost a
    corpus x centroid expression-tree join (the pre-r4 IVF bug)."""
    from ripcurrent_spark.operators.sigstore import ivf_cell_table

    ivf_cell_table(spark, SF_ORACLE).count()  # ensure the artifact is warm
    plan = _plan(spark, "ann_ivfpq_topk")
    assert "ivf_cells" in plan  # warm artifact scan, not a re-assignment
    assert "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivf_cell_balance_never_rescans_corpus(spark):
    """ann_ivf_cell_balance (r11): the audit reads ONLY the warm
    ivf_cells artifact — two partial-agg groupBys + a 1-row broadcast;
    the embeddings table and the assign_np Arrow pass must not appear
    in its plan (the corpus x sqrt(N) compute is the artifact build's
    business, paid once per corpus digest)."""
    from ripcurrent_spark.operators.sigstore import ivf_cell_table

    ivf_cell_table(spark, SF_ORACLE).count()  # ensure the artifact is warm
    plan = _plan(spark, "ann_ivf_cell_balance")
    assert "ivf_cells" in plan
    assert "embeddings" not in plan
    assert "MapInPandas" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_select_threshold_from_bottomk(spark):
    """VERDICT r9 #2: curation_dsir_select's threshold must come from
    the mergeable bottom-k sample (TakeOrderedAndProject), never an
    exact global percentile buffer over the corpus-sized weights
    frame. Descendants print after their parent in the plan string,
    so every percentile aggregate must reach a TakeOrderedAndProject
    before any scan — i.e. the only input a percentile ever sees is
    the k-row sample."""
    import re

    plan = _plan(spark, "curation_dsir_select")
    assert "TakeOrderedAndProject" in plan
    hits = list(re.finditer("percentile", plan))
    assert hits, "threshold aggregate missing from plan"
    for m in hits:
        tail = plan[m.end() :]
        topk = tail.find("TakeOrderedAndProject")
        scan = min(
            x for x in (tail.find("FileScan"), tail.find("InMemoryTableScan"), 1 << 30)
            if x != -1
        )
        assert topk != -1 and topk < scan, "percentile consumes a corpus-sized input"


def test_semdedup_capped_sharded(spark):
    """dedup_semdedup composes the kmeans assignment (MapInPandas)
    with the capped-index grouped scorer (FlatMapGroupsInPandas over
    (cluster, shard)); the capped id-set joins back via broadcast and
    nothing is cartesian."""
    plan = _plan(spark, "dedup_semdedup")
    assert "FlatMapGroupsInPandas" in plan
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_activity_gaps_no_explode_single_window(spark):
    # The gaps/islands report must stay lag-arithmetic: no calendar
    # densification (Generate/explode) and no cartesian anywhere.
    plan = _plan(spark, "q_activity_gaps")
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1


def test_event_debounce_single_window_shuffle(spark):
    # One hash-partitioned window on the series key; no join at all.
    plan = _plan(spark, "q_event_debounce")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan


def test_bpe_pairs_partial_agg_topk(spark):
    # Pair counting must partial-aggregate map-side (two HashAggregate
    # levels around the pair exchange) and never ship raw pairs into a
    # single-partition window without the count shrink first.
    plan = _plan(spark, "text_bpe_pair_counts")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    pre, _, post = plan.partition("hashpartitioning(pair")
    assert "HashAggregate" in pre and "HashAggregate" in post


def test_cluster_doc_profile_broadcast_assign_equi_join(spark):
    # Centroid assignment stays a broadcast/vectorized pass and the
    # docs join is an equi-join on the id, never a cartesian.
    plan = _plan(spark, "ann_cluster_doc_profile")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_source_divergence_grid_is_broadcast_only(spark):
    # The ONLY row multiplication allowed is the control-plane-sized
    # sources x vocab grid (broadcast nested loop); the corpus-linear
    # token count must stay a partial-agg groupBy with no Python.
    plan = _plan(spark, "text_source_divergence")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_quantize_error_zero_shuffle_no_python(spark):
    # Map-only audit: no exchange (beyond the scan), no Python, and
    # the staged scale column keeps codegen linear.
    plan = _plan(spark, "emb_quantize_error")
    assert "Python" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_referential_integrity_nation_broadcasts(spark):
    plan = _plan(spark, "mask_referential_integrity")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_basket_hot_parts_broadcast_before_pairs(spark):
    # The hot-part prune must reach the pair join as a broadcast —
    # the quadratic step never sees the unpruned corpus.
    plan = _plan(spark, "q_basket_rules")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# Queries whose broadcasts all flow through the size gate
# (ripcurrent_spark.operators.hints.bcast). A literal F.broadcast()
# on customer/supplier/part — relations whose row count scales with
# SF — is a guaranteed OOM at the 100 TB design point, because a hint
# overrides AQE and the autoBroadcast threshold unconditionally.
GATED = [
    "q3_shipping_priority", "q5_local_supplier", "q2_min_cost_supplier",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_revenue", "q11_important_stock", "q14_promo_revenue",
    "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_filter", "q20_suppliers_of_hot_parts",
    "q21_waiting_suppliers", "q22_idle_rich_customers",
    "q_revenue_share", "q_unpivot_nation_stats", "q_constraint_checks",
]


@pytest.mark.parametrize("name", GATED)
def test_gated_queries_still_broadcast_at_bench_scale(spark, name):
    # At bench scale every gated dim passes the gate, so the plan is
    # byte-for-byte the broadcast plan a literal hint would produce.
    assert "BroadcastHashJoin" in _plan(spark, name)


def test_no_unconditional_broadcast_survives_closed_gate(spark):
    """Close the gate (0 bytes) and disable the autoBroadcast
    threshold: if ANY BroadcastExchange remains, some relation carries
    an unconditional hint — the exact 100 TB failure mode the gate
    exists to prevent. This sweeps the whole gated set, so the pattern
    cannot silently come back."""
    spark.conf.set("spark.ripcurrent.broadcastGateBytes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in GATED:
            assert "BroadcastExchange" not in _plan(spark, name), name
    finally:
        spark.conf.unset("spark.ripcurrent.broadcastGateBytes")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def _single_partition_windows(plan: str) -> list[str]:
    """Window nodes whose input goes through Exchange SinglePartition —
    i.e. unpartitioned windows, which funnel their whole input frame
    into ONE task. Walks each SinglePartition exchange's ancestor chain
    (through Sort / WindowGroupLimit) to the owning node."""
    import re

    lines = plan.splitlines()
    info = []
    for s in lines:
        m = re.search(r"[A-Za-z*]", s)
        if m:
            info.append((m.start(), s[m.start():].lstrip("*").lstrip("(0123456789) ")))
        else:
            info.append((0, ""))
    hits = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = info[i][0]
        j = i - 1
        while j >= 0:
            d, txt = info[j]
            if d < depth:
                depth = d
                if txt.startswith("Sort ") or txt.startswith("WindowGroupLimit"):
                    j -= 1
                    continue
                if txt.startswith("Window"):
                    hits.append(txt[:80])
                break
            j -= 1
    return hits


# Global windows are ONLY acceptable over frames bounded by
# construction (constant or near-constant cardinality, independent of
# data volume). Everything else must use mergeable top-k
# (orderBy().limit() = TakeOrderedAndProject) or the range-bucketed
# exact ranking in operators/ranking.py.
BOUNDED_GLOBAL_WINDOWS = {
    # percent-of-total + FIRST_VALUE over the NATION aggregate (25 rows
    # at every SF)
    "q_revenue_share",
    # running sum over calendar DAYS — time-span-sized, not data-sized
    "q_cumulative_users",
    # running max over the per-DATE aggregate — same calendar-sized
    # boundedness class
    "q_pareto_orders",
    # share-of-total over the per-LANGUAGE counts frame (languages are
    # a fixed small vocabulary)
    "sample_domain_mix",
    # offsets over the <= n_buckets-row (constant 64) bucket-counts
    # frame inside operators/ranking.exact_global_ranks — every
    # consumer of the SINGLE-order operator lands here
    # (q_rfm_segments left this list in r7: exact_global_ranks_multi
    # embeds offsets as literals, so its plan has NO global window)
    "q_spend_percentiles",
    "q_gini_revenue",
    # cumulative ECDF over the VALUE-sized distinct-lengths frame
    # (corpus aggregates away first — own plan pin in
    # tests/test_round9_ops.py::test_ks_plan_aggregates_before_window)
    "q_ks_length_drift",
    # rank windows over the two LIMIT-100 ranker frames and their
    # <= 200-row fusion — top-k-sized by construction
    "search_rrf_fusion",
    # exclusive-prefix cumulative over the DISTINCT-FREQUENCY frame
    # (O(sqrt tokens) rows by Zipf itself; the vocab is never ranked
    # per term — rank ranges explode from group sizes)
    "text_zipf_slope",
}


def test_no_global_window_over_unbounded_frame(spark):
    """Registry-wide sweep: any unpartitioned window outside the
    documented bounded set is the single-task-sort scale bug coming
    back (the r5 verdict's What's-wrong #2) — fail loudly."""
    offenders = {}
    for name, q in sorted(all_queries().items()):
        plan = q.spark(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
        hits = _single_partition_windows(plan)
        if hits and name not in BOUNDED_GLOBAL_WINDOWS:
            offenders[name] = hits[0]
    assert not offenders, offenders


def test_bpe_apply_single_mapinpandas_no_per_merge_nodes(spark):
    """VERDICT r6 #6: the whole ordered merge table applies inside ONE
    MapInPandas (merge list in the closure); per-merge expression
    nodes would make the plan scale with vocabulary size (janino
    blowup at real vocabularies)."""
    from ripcurrent_spark.queries.text import _BPE_MERGES

    plan = _plan(spark, "text_bpe_apply")
    assert plan.count("MapInPandas") == 1
    for a, b in _BPE_MERGES:
        assert f"{a}_{b}" not in plan  # merges live in the closure, not the plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "source" not in read_schema


def test_remove_spans_single_text_scan(spark):
    """VERDICT r6 #7: both the chunk-frequency side and the reassembly
    side read the persisted chunk frame — corpus text tokenizes ONCE
    (two InMemoryTableScan readers over one cached relation, not two
    parquet scans of `text`)."""
    plan = _plan(spark, "dedup_remove_spans")
    assert plan.count("InMemoryTableScan") == 2
    assert "CartesianProduct" not in plan


def test_grouped_topk_uses_window_group_limit(spark):
    # Spark 4 pushes rank<=k into WindowGroupLimit (partial + final):
    # each task retains only k rows per group BEFORE the shuffle/sort,
    # so per-group top-k never materializes whole groups. Pin it.
    plan = _plan(spark, "q_top3_orders_per_cust")
    assert "WindowGroupLimit" in plan
