"""Headline-query benchmark.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Per query: one warm-up is amortized by running each query twice and keeping
the median-ish better-of-2? No — driver wants reproducible wall numbers:
we run one untimed JVM/session warm-up query, then each headline query once,
timed end-to-end (plan + execute + collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "gold_revenue_by_mktsegment",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "gold_top10_customers_by_revenue",
    "window_top3_orders_per_customer",
    "rollup_lineitem_flag_status",
    "tpch_q6_forecast_revenue",
    "tpch_q4_priority_with_returns",
    "tpch_q13_customer_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_orders",
    "percentile_order_value_by_segment",
    "platinum_customer_features",
    "events_json_kpis",
    "events_sessionization",
    "session_window_per_user",
    "events_asof_purchase_before_error",
    "tpch_q7_nation_trade_volume",
    "tpch_q9_profit_by_nation_year",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_sole_late_supplier",
    "window_moving_avg_daily_revenue",
    "calendar_daily_event_gapfill",
    "events_funnel_view_click_purchase",
    "rfm_customer_segments",
    "events_retention_cohorts",
    "events_dau_wau",
    "events_type_transition_matrix",
    "orders_pareto_top_customers",
    "orders_interpurchase_days",
    # LLM-pipeline ops
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_hamming",
    "text_quality_scores",
    "similarity_cosine_top10",
    "similarity_ivf_top5",
    "dedup_embedding_cosine_pairs",
    "embedding_int8_quantization",
    "text_tfidf_top_terms",
    "text_bigram_topk",
    "embedding_label_centroids",
    "embedding_dim_stats",
    "text_top_tokens_per_lang",
    "events_props_variant_stats",
    "text_array_stats_hof",
    "kmeans_embeddings_lloyd",
    "sample_stratified_by_segment",
    "stats_price_quantity_regression",
    "text_zipf_slope",
    "events_value_twap_per_user",
    "dedup_containment_pairs",
    "histogram_equal_frequency_totalprice",
    "events_ohlc_bars",
    "quality_redact_pii_documents",
    "dedup_span_duplication",
    "sketch_cms_heavy_hitters",
    "sample_language_balanced",
    "text_bigram_lm_score",
    "tpch_q11_important_part_value",
    "similarity_recall_lsh_at5",
    "similarity_pq_adc_top5",
    "similarity_pq_distortion",
    "sample_reservoir_per_lang",
    "stats_jackknife_mean_ci",
    "er_fuzzy_customer_match",
    "graph_pagerank_neardup",
    "window_range_7day_user_value",
    "stats_winsorized_mean_by_segment",
    "embedding_label_pca",
    "assoc_part_pairs_lift",
    "fullouter_daily_orders_vs_events",
    "text_bpe_pair_counts",
    "pipeline_llm_corpus_curation",
    "pipeline_token_budget_mix",
    "sample_train_test_split",
    "privacy_pseudonymized_join",
    "pipeline_sequence_packing",
    "pipeline_decontaminate_train",
    "text_repetition_ratio",
    "events_value_anomalies",
    "stats_mad_outliers_by_segment",
    "embedding_matryoshka_fidelity",
    "events_cumulative_unique_users",
    "dedup_canonical_selection",
    "events_top_paths_3step",
    "quality_profile_events_columns",
    "scd2_point_in_time_revenue",
    "dedup_multisignal_pairs",
    "events_hour_of_week_profile",
    "events_user_type_sets",
    "events_peak_minute_users_per_day",
    "suppliers_covering_all_top_parts",
    "sample_weighted_reservoir_per_lang",
    "text_inverted_index_sample",
    "stats_lineitem_corr_matrix",
    "privacy_forget_user_erasure",
    "embedding_centroid_drift",
    "dedup_incremental_lsh_gate",
    "events_ewma_user_value",
    "rollup_revenue_calendar",
    "text_chunk_boilerplate",
    "stats_welch_ttest_purchase_click",
    "quality_benford_first_digit",
    "stats_ks_value_drift",
    "graph_triangle_count_neardup",
    "similarity_minhash_jaccard_error",
    "dedup_bloom_prefilter_probe",
    "pipeline_shard_manifest",
    "text_langid_confusion",
    "pipeline_rag_chunks",
    "pipeline_global_row_index",
    "events_type_runs",
    "stats_qq_purchase_click",
    "dedup_semdedup_clusters",
    "stats_gini_customer_revenue",
    "sample_neyman_allocation",
    "sample_dsir_importance",
    "stats_quantile_normalize_sources",
    "graph_supplier_copart_pairs",
    "events_locf_daily_user_value",
    "dedup_prefix_filter_jaccard",
    # advanced analytics
    "events_user_activity_bitmap",
    "events_changepoint_cusum",
    "stats_bootstrap_ci",
    "text_heaps_law_fit",
    "events_concurrent_sessions_sweepline",
    "storage_dictionary_encoding_audit",
    "storage_zorder_pruning_audit",
    "dedup_clusters_star",
    "sketch_hll_mergeable_daily_rollup",
    "sketch_hll_sliding_7day_users",
    "sketch_hll_audience_overlap",
    "sketch_histogram_quantiles",
    "join_bucketed_colocated",
    "multimodal_header_kpis",
    "stats_wilson_ci_purchase_rate",
    "stats_theil_sen_daily_trend",
    "stats_chisq_lang_source",
    "stats_mutual_info_type_hour",
    "stats_kaplan_meier_session_duration",
    "stats_anova_value_by_type",
    "lateral_top2_acctbal_per_nation",
    "finance_penny_allocation",
    "quality_table_checksum",
    "orders_cohort_ltv",
    "brand_rank_shift_quarterly",
    "stats_twopass_exact_median",
    "events_attribution_first_vs_last",
    "forecast_holt_monthly_revenue",
    "sample_coreset_kcenter",
    "text_gopher_quality_filter",
    "sample_temperature_lang",
    "text_token_entropy_by_lang",
    "forecast_stl_decompose_monthly",
    "events_markov_stationary",
    "orders_open_backlog_daily",
    "quality_error_rate_control_chart",
    "events_bot_detection_heuristic",
    "pipeline_dataset_cards",
    "text_rake_keywords",
    "stats_ridge_regression_normal_eq",
    "text_ngram_novelty_rate",
    "quality_fd_discovery",
    "stats_benjamini_hochberg",
    "load_delete_where",
    "load_update_set",
    "orders_abc_classification",
    "stats_runs_test_randomness",
    "events_burstiness_fano",
    "load_constraint_enforcement",
    "events_watermark_lateness_audit",
    "quality_order_lineitem_reconciliation",
    "events_ab_experiment_cuped",
    "forecast_holt_winters_monthly",
    "load_shallow_clone",
    "events_did_difference_in_differences",
    "stats_partial_correlation",
    "load_merge_full_clauses",
    "graph_kcore_supplier_coorder",
    "orders_littles_law_check",
    "similarity_recall_ivf_at5",
    "quality_expectation_suite_events",
    "stats_mann_whitney_u",
    "events_periodicity_autocorr",
    "storage_partition_advisor",
    "pipeline_tokenizer_vocab_coverage",
    "load_restore_version",
    "events_markov_removal_attribution",
    "events_conversion_window_sensitivity",
    "quality_label_balance_embeddings",
    "dedup_ground_truth_eval",
    "text_perplexity_buckets_ccnet",
    "events_power_analysis_mde",
    "text_bigram_pmi_topk",
    "quality_duplicate_full_rows_events",
    "stats_spearman_rank_corr",
    "events_uplift_qini_deciles",
    "quality_rule_mining_bounds",
    # round 5
    "text_unigram_kl_by_source",
    "quality_dup_cluster_size_distribution",
    "dedup_cross_source_overlap",
    "privacy_k_anonymity_audit",
    "text_tokenizer_fertility_by_lang",
    "pipeline_packing_efficiency_curve",
    # round 6/7: flagship LLM-ops tokenizer primitives (VERDICT r6 ask #3)
    "text_bpe_merge_rounds",
    "text_bpe_encode_token_counts",
    # round 7: make the CC pointer-doubling cost visible (VERDICT r6 ask #6)
    "dedup_duplicate_clusters",
    # round-7-new operators
    "dedup_winnowing_fingerprints",
    "dedup_threshold_sweep_pr",
    "pipeline_shard_dup_leakage",
    "text_script_mix_audit",
    "pipeline_doremi_mixture_step",
    "privacy_l_diversity_audit",
    "dedup_minhash_band_planner",
    "pipeline_embedding_decontamination",
    "sample_leakage_free_split",
    "text_unigram_viterbi_segment",
    "text_unigram_lm_em_round",
    "quality_schema_drift_versions",
    "forecast_backtest_mape",
    "pipeline_curriculum_phases",
    "quality_null_pattern_clusters",
    "events_segment_migration_matrix",
    "similarity_lsh_multiprobe_top5",
    "dedup_bcubed_cluster_eval",
    "similarity_recall_multiprobe_at5",
    "sketch_kmv_distinct_users",
    "graph_clustering_coefficient_neardup",
    "dedup_candidate_selectivity_compare",
    "stats_roc_auc_quality_vs_gopher",
    "quality_calibration_ece_brier",
    "stats_isotonic_calibration_pav",
    "stats_cohens_kappa_quality_raters",
    "sample_unimax_language_budget",
    "text_bm25_topk",
    "sketch_bloom_filter_fpr",
    "graph_modularity_supplier_nations",
    "stats_permutation_test_purchase_click",
    "text_good_turing_trigrams",
    "privacy_dp_laplace_histogram",
    "text_mattr_lexical_diversity",
    "sample_pps_systematic_suppliers",
    "graph_label_propagation_communities",
    "stats_brown_forsythe_variance",
    "pipeline_shard_assignment_rendezvous",
    "multimodal_tile_manifest",
    "sketch_join_cardinality_estimate",
    "text_js_divergence_lang_pairs",
    "privacy_t_closeness_audit",
    "graph_adamic_adar_link_prediction",
    "stats_kendall_tau_daily",
    # round-7 final stretch
    "stats_kruskal_wallis_value_by_type",
    "stats_cramers_v_lang_source",
    "graph_hits_hubs_authorities",
    "text_readability_flesch",
    "stats_ljung_box_daily_volume",
    "sample_horvitz_thompson_chars",
    "sketch_ams_f2_user_moment",
    "stats_fleiss_kappa_quality_raters",
    "stats_nelson_aalen_cumhaz",
    "events_cmh_purchase_by_variant_daystrata",
    "stats_mcnemar_quality_raters",
    "dedup_content_defined_chunks",
    "events_markov_entropy_rate",
    "text_burrows_delta_sources",
    "stats_hill_tail_index_orders",
    "stats_breusch_pagan_price_quantity",
    "stats_durbin_watson_daily_revenue",
    "multimodal_audio_vad_energy",
    "text_chao1_vocab_richness",
    "stats_ks_exponential_interarrival",
    "stats_gumbel_daily_max_value",
    "stats_platt_scaling_newton",
    "etl_length_of_stay_profile",
    "stats_pacf_daily_volume",
    "stats_cooks_distance_price_quantity",
    "events_longest_daily_streaks",
    "stats_tost_equivalence_purchase_click",
    "stats_fisher_combined_pvalue",
    "stats_bartlett_variance_homogeneity",
    "events_periodogram_daily",
    "orders_xyz_classification",
    "events_cross_correlation_purchase_click",
    "quality_semantic_type_inference",
    "events_growth_accounting_weekly",
    "stats_negbin_fit_user_counts",
    "events_retention_powerlaw_fit",
    "text_vocab_jaccard_sources",
    "events_seasonal_strength_daily",
]

# Write-path / streaming representatives (VERDICT r7 ask #3): these
# materialize zone state or drain a stream, so they are excluded from the
# read-only HEADLINE total — but a write-path regression (like r6's
# staged-commit +0.5s) must still be visible per-round. They are timed
# with the same median-of-N protocol into a separate committed table
# ("write_queries"/"write_total" in BENCH_FULL.json + the compact line).
# load_merge_full_clauses already rides HEADLINE; the rest cover CDF
# apply, bloom-index point lookup, the run_job state machine + quarantine
# split, OCC publish (update_set), compact+vacuum, and the two heaviest
# streaming drains.
WRITE_HEADLINE = [
    "load_cdf_replication_apply",
    "load_bloom_index_point_lookup",
    "load_delete_where",
    "load_restore_version",
    "storage_compact_vacuum_audit",
    "etl_run_job_silver",
    "etl_quarantine_split",
    "streaming_left_outer_interval_join",
    "streaming_neardup_admission_gate",
    # r9 (VERDICT r8 ask #7): both heaviest streaming families tracked —
    # sliding-window top-k state and the quality-rule admission gate.
    "streaming_sliding_topk_event_types",
    "streaming_quality_admission_gate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from healthcare_data_lakehouse_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("bench")
    qs = e.queries()

    # JVM/session warm-up (untimed): touch every input table once.
    from healthcare_data_lakehouse_spark.tables import TABLE_NAMES, table

    for t in TABLE_NAMES:
        table(spark, sf_dir, t).count()

    # Median of 3 timed runs per query (BASELINE.md measurement plan:
    # warm JVM, median of 3) — plan + execute + count end-to-end each run,
    # with cached intermediates cleared so every run pays the full cost.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        samples = []
        # per-query isolation: one broken query must never zero the whole
        # bench run (round-2 postmortem) — record the error, keep timing
        try:
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).count()  # force full execution
                samples.append(time.time() - t0)
            times[name] = round(sorted(samples)[len(samples) // 2], 3)
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
            print(f"ERROR {name}: {errors[name]}", file=sys.stderr)

    # Write-path/streaming representatives: same protocol, separate table
    # (never summed into the read-only headline total).
    wtimes: dict[str, float] = {}
    for name in WRITE_HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        samples = []
        try:
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            wtimes[name] = round(sorted(samples)[len(samples) // 2], 3)
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
            print(f"ERROR {name}: {errors[name]}", file=sys.stderr)

    total = round(sum(times.values()), 3)
    write_total = round(sum(wtimes.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query detail goes to a file: the driver records only the
    # last ~2000 chars of stdout, and 150+ query timings don't fit on one
    # line (round-3 postmortem: BENCH_r03 has parsed=None because the
    # JSON line was truncated from the front). The printed line stays
    # compact — total + the slowest queries that fit — and always parses.
    # No-silent-caps: the headline list curates the catalog (streaming
    # drains, zone-write loads, shape-duplicates excluded) — record how
    # many and which, so the curation is visible, not implicit.
    excluded = sorted(set(qs) - set(HEADLINE) - set(WRITE_HEADLINE))
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "write_total": write_total,
        "write_queries": wtimes,
        "sf": sf_val,
        "catalog": len(qs),
        "headline": len(times),
        "excluded": len(excluded),
        "excluded_queries": excluded,
    }
    if errors:
        full["errors"] = errors
    full_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    full_path.write_text(json.dumps(full, indent=1))

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "queries_run": len(times),
        "errors_n": len(errors),
        "catalog": len(qs),
        "excluded": len(excluded),
        "write_total": write_total,
        "write_n": len(wtimes),
        "full": "BENCH_FULL.json",
        "queries": dict(ranked),
    }
    line = json.dumps(out, separators=(",", ":"))
    keep = len(ranked)
    while len(line) > 1800 and keep > 10:
        keep -= 5
        out["queries"] = dict(ranked[:keep])
        line = json.dumps(out, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
