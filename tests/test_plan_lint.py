"""The plan linter gates every registered batch query: no cartesian
products, no Python in hot paths, no undeclared single-partition
ordered stages."""

from __future__ import annotations


def test_catalog_passes_plan_lint(spark, sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import lint

    assert lint(spark, sf_dir) == []


# Measured single-partition exchange volume at sf0.001 (tools/plan_lint.py
# single_partition_exchange_rows), pinned with ~3x headroom. Each bound is
# the runtime teeth behind the GLOBAL_WINDOW_OK justification: the
# allowlist claims the ordered one-task stage sees only grain-sized data
# (days/months/vocab/deciles/...), and this test fails if a future edit
# silently grows that stage. Entries whose justification notes
# "continuous-double scale" (distinct-value aggregates) legitimately track
# the fact-table row count at tiny SF — their bounds pin today's volume so
# growth is still caught.
GRAIN_BOUNDS = {
    # per-arm rank over the linked doc/vec corpus (sf0.001: 499 rows —
    # the fixture-scale stand-in for the k∪k fused candidate set)
    "similarity_rrf_hybrid_top10": 1500,
    # water-filling runs over the language-grain aggregate
    "sample_unimax_language_budget": 16,
    # cumulative-size prefix sum over the supplier dim (sf0.001: 100)
    "sample_pps_systematic_suppliers": 600,
    "events_changepoint_cusum": 100,
    "events_concurrent_sessions_sweepline": 64,
    "events_cumulative_unique_users": 16,
    "events_uplift_qini_deciles": 50,
    # lag/lead taps over the events day-grain series
    "events_pattern_vshape_days": 100,
    # share normalization over the 5-row priority aggregate
    "forecast_hierarchical_topdown": 16,
    # distinct time-to-convert latencies (sf0.001: <= #converters)
    "events_funnel_time_to_convert": 600,
    # lag window over the orders day-grain series
    "stats_adf_unit_root_daily": 4_800,
    # residual prefix sums over the orders day-grain series
    "stats_kpss_level_stationarity": 4_800,
    # NTILE over the user-grain aggregate
    "events_ate_stratified_standardization": 600,
    # running-max/argmax over the orders day-grain revenue series
    "finance_max_drawdown_daily": 4_800,
    # prefix/argmax over the distinct-quantity aggregate (TPC-H: <= 50)
    "stats_decision_stump_split": 64,
    # ordinal + running-count windows over the 100-row post-limit prefix
    "pipeline_mixture_interleave_order": 256,
    "events_watermark_lateness_audit": 16,
    "forecast_backtest_mape": 240,
    "forecast_stl_decompose_monthly": 240,
    "histogram_equal_frequency_totalprice": 4_500,
    "orders_abc_classification": 600,
    "orders_open_backlog_daily": 4_800,
    "orders_pareto_top_customers": 500,
    "orders_yoy_growth": 30,
    "pipeline_curriculum_phases": 1_600,
    "pipeline_packing_efficiency_curve": 1_600,
    "pipeline_global_row_index": 64,
    # offset prefix sum over the |partitions|-row count table
    "er_sorted_neighborhood_pairs": 64,
    "quality_calibration_ece_brier": 16,
    "quality_rule_mining_bounds": 18_000,
    "rfm_customer_segments": 50,
    "sample_temperature_lang": 16,
    "stats_benjamini_hochberg": 16,
    "stats_fisher_combined_pvalue": 16,
    "stats_gini_customer_revenue": 500,
    "stats_kaplan_meier_session_duration": 100,
    "stats_nelson_aalen_cumhaz": 100,
    "stats_ks_value_drift": 400,
    "stats_kruskal_wallis_value_by_type": 3_000,
    "stats_ks_exponential_interarrival": 3_000,
    "stats_mann_whitney_u": 1_200,
    "stats_isotonic_calibration_pav": 16,
    "stats_roc_auc_quality_vs_gopher": 1_200,
    "stats_runs_test_randomness": 3_300,
    "stats_spearman_rank_corr": 18_000,
    "text_zipf_slope": 100,
    "window_customer_value_deciles": 500,
    "window_mom_revenue_growth": 240,
    "window_moving_avg_daily_revenue": 3_300,
    # round-13 entries (measured at sf0.001: orders day grain 1094,
    # events day grain 30, hour spine 720, calibration split 372)
    "stats_pettitt_changepoint": 4_800,
    "stats_granger_causality_daily": 100,
    "stats_conformal_interval_coverage": 2_000,
    "stats_hurst_rescaled_range": 4_800,
    "events_burst_intervals_dp": 1_000,
    "quality_anomaly_stl_residual": 4_800,
    "pipeline_lpt_shard_balance": 600,
    "stats_binseg_changepoints": 4_800,
}


def test_allowlisted_single_partition_stages_stay_grain_sized(spark, sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import GLOBAL_WINDOW_OK, single_partition_exchange_rows

    from healthcare_data_lakehouse_spark.queries.catalog import load_all

    qs = load_all()
    # every allowlist entry must carry a bound (adding to GLOBAL_WINDOW_OK
    # without declaring the grain here fails loudly)
    assert set(GRAIN_BOUNDS) == set(GLOBAL_WINDOW_OK)

    over = {}
    for name, bound in sorted(GRAIN_BOUNDS.items()):
        rows = single_partition_exchange_rows(qs[name].fn(spark, sf_dir))
        worst = max(rows, default=0)
        if worst > bound:
            over[name] = (worst, bound)
    assert over == {}, f"single-partition stages grew past declared grain: {over}"
