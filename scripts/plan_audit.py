"""Physical-plan audit for the headline queries.

Renders each audited query's formatted plan and greps it for the
anti-patterns that kill 100 TB runs, writing PLAN_AUDIT.md:

* CartesianProduct / BroadcastNestedLoopJoin — quadratic or
  driver-melting joins (FAIL: none allowed anywhere).
* Exchange count — shuffles in the final plan (report; iterative
  operators localCheckpoint per round, so their loop shuffles are
  audited by their per-round tests, not visible here).
* PushedFilters / ReadSchema on parquet scans — predicate pushdown and
  column pruning actually reaching the source.
* WholeStageCodegen spans and Python boundaries (ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas) — JVM-side vs Arrow-batched
  work; row-at-a-time BatchEvalPython is a FAIL.

Usage: python scripts/plan_audit.py [sf_dir] (default sf0.01).
"""

from __future__ import annotations

import importlib
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from big_data_graph_analysis_with_spark_spark import get_spark  # noqa: E402

#: queries whose FINAL plan is representative (declarative, one-shot);
#: driver-loop queries (simrank rounds, walks, components...) are
#: excluded — their per-round plans are exercised under tests and their
#: outputs here are just checkpoint scans.
AUDIT = [
    "degrees", "start_nodes", "parent_map", "best_match",
    "induced_subgraph_edges", "triangle_counts", "link_prediction",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_prefix_containment", "similarity_topk", "rp_project",
    "grid_clusters", "text_quality", "tfidf_top_terms",
    "pricing_summary", "shipping_priority", "top_customers_per_nation",
    "events_sessionized", "events_asof", "events_range_join",
    "events_rollup", "mixture_sample", "priority_sample",
    "length_matched_resample", "quality_filter", "source_overlap",
    "bloom_pruned_join", "ngram_novelty", "multimodal_real_codecs",
    "snapshot_diff", "k_anonymity", "type_projection",
    "neighborhood_features", "orders_point_in_time", "churned_users",
    "forecast_revenue", "returned_items",
    # round-6 additions (the non-iterative ones)
    "neighbor_jaccard", "resource_allocation", "two_hop_reach",
    "char_trigrams", "token_length_hist", "quality_deciles",
    "text_normalize", "promo_revenue_share", "customer_order_histogram",
    "late_shipment_priority", "embedding_norms", "dim_variance",
    # round-7 additions (the non-iterative ones)
    "supplier_pareto", "part_supplier_variety", "idle_customers",
    "nation_trade_flow", "length_gini", "centroid_distances",
    "degree_clustering", "order_priority_funnel",
    "supplier_leadtime_quantiles", "large_orders", "small_lot_revenue",
    "top_inactivity_gaps", "source_length_quantiles",
    "charclass_profile", "rich_club", "joint_degree_profile",
    "user_activity_pareto", "weekly_active_users", "stopword_coverage",
    "embedding_grid_occupancy", "disjunctive_revenue",
    "cheapest_supplier",
    # round-7 second batch
    "market_share", "supplier_nation_margin", "top_supplier_quarter",
    "monthly_revenue_growth", "customer_acquisition", "hapax_by_source",
    "sentence_stats", "edge_support_hist",
    # round-7 third batch
    "common_neighbor_hist", "rfm_segments", "part_catalog_rollup",
    "nation_revenue_trend", "vocab_overlap", "embedding_dot_hist",
    # round-7 fourth batch
    "global_transitivity", "sole_returned_supplier", "supplier_hhi",
    "order_size_profile", "activity_streaks", "daily_autocovariance",
    # round-7 fifth batch
    "edge_quality_census", "source_corr_profile", "order_cohort_retention",
    "supply_bipartite_profile", "pricing_knob_grid",
    "user_event_type_diversity",
    # round-7 sixth batch
    "edge_block_census", "segment_revenue_mix", "supplier_balance_deciles",
    "priority_mix_shift", "leading_tokens", "value_moments",
    # round-7 seventh batch
    "component_density_profile", "fk_integrity_census",
    "custbal_order_corr", "brand_price_moments", "lang_token_moments",
    "knn_mutuality",
    # round-7 eighth batch
    "perturbation_census", "revenue_reconciliation", "linenumber_holes",
    "entry_exit_matrix", "type_cooccurrence", "label_norm_profile",
    # round-7 ninth batch
    "trailing_revenue_range", "balance_quartile_mix",
    "sales_grouping_sets", "nation_quarter_extremes",
    # round-7 tenth batch
    "part_metrics_long", "nation_segment_signature", "token_class_mix",
    "activity_span_hist",
    # round-8 first batch (TPC-H completion)
    "part_value_concentration", "late_line_census", "bulk_part_suppliers",
    "regional_local_revenue",
    # round-8 second/third batches (greedy_walk_classes excluded: its
    # simrank side is iterative/checkpointed like the other loop queries)
    "graph_sketch_audit", "revenue_ewma", "daily_gap_fill", "value_locf",
    "user_set_ops", "segment_bitmask", "embedding_clip_census",
    "balance_outlier_census",
    # round-9 additions (simrank_round1_bucketed_wide excluded with the
    # rest of the simrank loop family)
    "skew_salted_enrich", "graph_degree_quantile_audit",
    "weighted_price_median",
    # round-10 additions (similarity_ann_pq included deliberately: its
    # query-side cross join must lower to a bounded-probe-side
    # BroadcastNestedLoopJoin, never a CartesianProduct)
    "segment_priority_chisq", "discount_trend_stats",
    "event_value_benford", "order_gap_profile", "quantity_mode",
    "user_type_map_census", "word_run_lengths", "part_name_typo_pairs",
    "local_bridges", "dyad_census", "embedding_sign_profile",
    "similarity_ann_pq",
    # round-10 second batch
    "value_band_census", "priority_transition_census",
    "type_trigram_census", "lang_collision_stats",
    "wedge_closure_by_bucket", "directed_triangle_census",
    "similarity_ann_ivfpq", "attribute_mixing_matrix",
    "value_roundness_census",
    # round-10 fourth batch (bowtie_census excluded: SCC fixpoint runs
    # at plan-construction time, same reason as component_sizes)
    "ship_delay_histogram", "repeat_rate_by_segment",
    # round-10 fifth batch (scc_size_profile excluded with the SCC loop
    # family)
    "interpolated_median_stats", "repeat_purchase_latency",
    # batch 6: distribution-shift / rank statistics (all one-shot
    # declarative: histogram shuffles + bounded-frame windows)
    "mann_whitney_u", "ks_two_sample", "spearman_rank_corr",
    "spearman_tie_terms", "mood_median_inputs", "qq_decile_table",
    "size_tie_census", "percent_rank_band_census", "revenue_cusum",
    "revenue_acceleration_census", "revenue_monotone_runs",
    "supplier_cosupply_degree", "hash_sample_estimate_audit",
    # batch 7 (all one-shot declarative)
    "kendall_tau_band_inputs", "wilcoxon_signed_rank", "cvm_two_sample",
    "ab_proportion_inputs", "mann_kendall_trend", "runs_test_inputs",
    "lorenz_curve_points", "tukey_fence_census",
    # round-12 registration (kcore_census excluded: its peel census
    # counts eagerly and returns a literal frame, same reason as
    # motif_counts; winnow_overlap_pairs / source_copy_matrix audit the
    # post-checkpoint cap+join+rollup plan — the fingerprint subtree is
    # materialized at plan construction by design, r11 advice)
    "pettitt_changepoint", "seasonal_mann_kendall", "trimmed_sum_census",
    "measure_crossproducts", "l_diversity_census", "zipf_rank_freq",
    "ivm_orders_rollup", "ivm_distinct_priorities", "ivm_histogram_median",
    "poisson_bootstrap", "block_bootstrap", "props_variant_stats",
    "km_risk_table", "mcnemar_inputs", "daily_count_autocorr",
    "friedman_rank_inputs", "filter_agreement_census",
    "jonckheere_trend_inputs", "ngram_novelty_profile",
    "kruskal_wallis_inputs", "mood_scale_inputs", "cochran_q_inputs",
    "token_mix_allocation", "degree_assortativity_inputs",
    "rich_club_census", "brunner_munzel_inputs", "count_min_audit",
    "ks_one_sample_uniform", "page_trend_inputs", "dominance_census",
    "bloom_filter_audit", "winnow_overlap_pairs", "revenue_cube",
    "source_copy_matrix",
]
# motif_counts is deliberately NOT in AUDIT: its builder runs the full
# census via driver-side .count() actions, so the final frame is just a
# createDataFrame literal scan — auditing it measures nothing while
# executing the census twice (once per explain mode). Same reason for
# component_sizes / dedup_cluster_sizes (their CC fixpoints execute at
# plan-construction time; the loop shuffles are covered by the
# connected_components / dup_groups per-round tests).

FAIL_PATTERNS = {
    "CartesianProduct": "cartesian product",
    "BatchEvalPython": "row-at-a-time Python UDF",
}
WARN_PATTERNS = {
    "BroadcastNestedLoopJoin": "nested-loop join",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    entry = importlib.import_module("__spark_entry__")
    queries = entry.queries()

    rows = []
    failures = []
    for name in AUDIT:
        df = queries[name](spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        plan = df._jdf.queryExecution().explainString(
            mode.fromString("formatted")
        )
        # codegen markers (*(N) Op) appear in simple mode only once the
        # plan is concrete — AQE wraps everything in AdaptiveSparkPlan
        # pre-execution, so re-plan the same logical plan with AQE off
        # for this one metric
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            simple = (
                queries[name](spark, sf_dir)
                ._jdf.queryExecution()
                .explainString(mode.fromString("simple"))
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        fails = [label for pat, label in FAIL_PATTERNS.items() if pat in plan]
        warns = [label for pat, label in WARN_PATTERNS.items() if pat in plan]
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
        arrow = len(
            re.findall(
                r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|PythonMapInArrow",
                plan,
            )
        )
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        scans = len(re.findall(r"Scan parquet", plan))
        # join-strategy census: broadcast-hash vs shuffle joins actually
        # chosen at this SF. After round 9's size-gating (forced hints on
        # sf-proportional tables replaced by functions/joins.maybe_broadcast)
        # this column is the evidence that small-SF plans still broadcast —
        # via the gate/AQE, not via an unconditional hint.
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        if fails:
            failures.append((name, fails))
        rows.append(
            (name, n_exchange, n_codegen, arrow, f"{pushed}/{scans}",
             f"{n_bhj}/{n_smj}", ", ".join(fails + warns) or "—")
        )
        print(f"[audit] {name}: exch={n_exchange} codegen={n_codegen} "
              f"arrow={arrow} pushed={pushed}/{scans} bhj={n_bhj} "
              f"smj={n_smj} "
              f"{'FAIL ' + str(fails) if fails else ''}", file=sys.stderr)

    out = Path(__file__).resolve().parent.parent / "PLAN_AUDIT.md"
    with out.open("w") as f:
        f.write(
            "# PLAN_AUDIT — physical-plan checks on the declarative "
            "headline queries\n\n"
            f"Generated by `scripts/plan_audit.py` at `{sf_dir}`. "
            "Driver-loop operators (SimRank, components, walks…) are "
            "audited per-round by their tests; this table covers the "
            "one-shot declarative plans.\n\n"
            "| query | exchanges | codegen spans | arrow-python ops | "
            "scans w/ pushdown | bcast/smj joins | flags |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | {r[5]} "
                f"| {r[6]} |\n"
            )
        f.write(
            "\nFAIL patterns (none may appear): CartesianProduct, "
            "BatchEvalPython. Arrow-python ops are the *intended* "
            "Arrow-batched kernels (multimodal decode, ANN BLAS, walks).\n"
        )
    if failures:
        print(f"PLAN AUDIT FAILED: {failures}")
        return 1
    print(f"plan audit clean: {len(rows)} queries -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
