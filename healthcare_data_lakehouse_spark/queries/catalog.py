"""Central query registry.

Each :class:`QuerySpec` couples a PySpark builder ``(spark, sf_dir) ->
DataFrame`` with the equivalent DuckDB SQL (``oracle``), using IDENTICAL
output column names/aliases so the driver's order-insensitive value-hash
compare lines up. Specs with ``oracle=None`` are non-SQL-expressible and get
the driver's weaker rows-only check.

Submodules register into ``QUERIES`` at import time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "QUERIES", "register"]


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, description: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERIES[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


# Catalog ordering: the reference-parity surface (transform_*/load_*/etl_*/
# lineage_*/quality_*), the flagship, and historically fragile queries come
# FIRST so any prefix sample of the catalog exercises the queries that
# matter most for parity evidence. Everything else follows in registration
# order — which, since the round-8 module split, means load_all()'s import
# order below (analytics_ext before analytics_olap, llm families
# alphabetical), NOT the pre-split monolith order. Only the PRIORITY
# prefix (50 entries, exactly the driver's sample window) is
# position-stable across rounds; never compare tail positions against
# pre-split rounds.
PRIORITY = [
    "gold_revenue_by_mktsegment",
    # reference-parity surface (SURVEY.md §2): transforms + loads + ETL +
    # lineage + quality
    "transform_dedup_first_wins",
    "transform_standardize_dates",
    "transform_clean_pipeline",
    "load_merge_upsert",
    "load_incremental_append_new",
    "load_append_inserts_all",
    "load_time_travel_diff",
    "load_zone_map_pruned_scan",
    "source_csv_roundtrip_events",
    "source_json_roundtrip_events",
    "etl_run_job_silver",
    "etl_quarantine_split",
    "etl_promote_zone_chain",
    "lineage_medallion_edges",
    "lineage_graph_audit",
    "lineage_columns_from_plan",
    "quality_validate_silver",
    "quality_validate_bronze",
    "quality_promotion_gate",
    "quality_fk_integrity_gold",
    # (quality_custom_rule_ssn_plaintext, quality_redact_pii_documents,
    # quality_profile_events_columns, quality_consistency_rule_discharge
    # rotated out in round 7: hash-green in the r5 AND r6 driver records,
    # code untouched since, not §2-cited rows — still verified by every
    # full compare.py sweep; slots freed for the round-7 classifier-
    # evaluation family below)
    # previously-red queries: keep them inside any sampled prefix so fixes
    # show up in the oracle record
    # (events_sessionization, events_concurrent_sessions_sweepline,
    # orders_cohort_ltv, finance_price_volume_bridge,
    # stats_kaplan_meier_session_duration, events_value_twap_per_user,
    # window_range_7day_user_value, percentile_order_value_by_segment
    # rotated out in round 7: green in the driver record for 2+ rounds
    # and re-verified by every full compare.py sweep)
    # (events_json_kpis, skew_salted_join_event_kpis and
    # pivot_returnflag_by_linestatus rotated out in round 6: green since
    # round 3 and still verified by the full compare.py sweep each round)
    # Round-6 rotation. The driver samples the FIRST 50 catalog entries —
    # the §2 parity surface and previously-red queries above stay pinned;
    # the remaining slots rotate (a) queries whose CODE PATHS were
    # rewritten this round or last, so oracle parity after a rewrite is
    # evidenced in the committed driver record (ADVICE r5), and (b)
    # recently added queries. The full TPC-H Q1-Q22 sweep and every
    # LLM-pipeline family are verified by tools/compare.py and pytest
    # every round regardless.
    # Round-8 rotation. The driver samples the FIRST 50 catalog entries —
    # the §2 parity surface above stays pinned (21 slots); the remaining
    # 29 rotate (a) queries whose CODE PATHS were rewritten this round so
    # oracle parity after a rewrite is evidenced in the committed driver
    # record, and (b) the r7 late-stretch queries that have never appeared
    # in any driver window (VERDICT r7 ask #4 — green in every full
    # compare.py sweep, but the driver's own record should confirm a
    # rotation slice). Everything rotated out (r7 window: load_update_set,
    # storage_compact_vacuum_audit, text_bpe_encode_token_counts,
    # dedup_winnowing_fingerprints, pipeline_shard_dup_leakage,
    # text_script_mix_audit, pipeline_doremi_mixture_step,
    # privacy_l_diversity_audit, pipeline_embedding_decontamination,
    # sample_leakage_free_split, streaming_quality_admission_gate,
    # quality_schema_drift_versions, text_unigram_viterbi_segment,
    # text_unigram_lm_em_round, forecast_backtest_mape,
    # pipeline_curriculum_phases, quality_null_pattern_clusters,
    # similarity_lsh_multiprobe_top5, sketch_kmv_distinct_users, the
    # classifier-evaluation quartet) is hash-green in CORRECTNESS_r07 and
    # re-verified by every full compare.py sweep.
    # Round-10 rotation (VERDICT r9 ask #2). Everything rotated out (the
    # r9 window: the 29 first-time names in CORRECTNESS_r09) is hash-green
    # there and re-verified by every full compare.py sweep
    # (COMPARE_FULL_r09.txt). All 29 slots below are first-time names:
    # 28 from the 190-query never-sampled tail (checked against
    # CORRECTNESS_r01..r09) + the new-in-r10 span-merge query, chosen for
    # family diversity (TPC-H, OLAP windows/grouping-sets, dedup, ANN,
    # text, pipeline, sampling, graph, sketch, events, stats, quality,
    # privacy, multimodal, streaming).
    "tpch_q12_lateness_priority",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_high_balance",
    "window_customer_value_deciles",
    "groupingsets_lineitem_flag_status",
    "unpivot_lineitem_metrics",
    "dedup_simhash_block_index",
    "dedup_transitive_closure_sql",
    "dedup_span_duplication",
    "dedup_span_merge_intervals",
    "similarity_recall_ivf_at5",
    "similarity_ivfpq_top5",
    "text_good_turing_trigrams",
    "text_perplexity_buckets_ccnet",
    "text_gopher_quality_filter",
    "text_bigram_pmi_topk",
    "pipeline_rag_chunks",
    "pipeline_shard_assignment_rendezvous",
    "sample_dsir_importance",
    "sample_unimax_language_budget",
    "graph_kcore_supplier_coorder",
    "graph_triangle_count_neardup",
    "sketch_hll_mergeable_daily_rollup",
    "sketch_bloom_filter_fpr",
    "streaming_stateful_user_totals",
    # all four new-in-r10 operators get driver evidence this round
    # (span-merge and ivfpq are slotted above); ridge regression and FD
    # discovery return to the never-sampled rotation pool for r11
    "pipeline_effective_token_yield",
    "similarity_ivf_list_balance",
    "privacy_forget_user_erasure",
    "multimodal_tile_manifest",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query submodule so registrations run, then order the
    catalog priority-first (parity + flagship + fragile queries lead)."""
    from healthcare_data_lakehouse_spark.queries import (  # noqa: F401
        advanced,
        analytics_ext,
        analytics_olap,
        behavior_events,
        behavior_stats,
        etl_queries,
        llm_dedup,
        llm_graph_stats,
        llm_pipeline,
        llm_similarity,
        llm_text,
        quality_queries,
        semistructured,
        streaming_queries,
    )

    ordered = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    return ordered
