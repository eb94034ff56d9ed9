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
# order.
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
    "quality_custom_rule_ssn_plaintext",
    "quality_fk_integrity_gold",
    "quality_redact_pii_documents",
    "quality_profile_events_columns",
    "quality_consistency_rule_discharge",
    # previously-red queries: keep them inside any sampled prefix so fixes
    # show up in the oracle record
    "events_sessionization",
    "events_concurrent_sessions_sweepline",
    "stats_kaplan_meier_session_duration",
    "events_value_twap_per_user",
    "window_range_7day_user_value",
    "percentile_order_value_by_segment",
    "orders_cohort_ltv",
    "finance_price_volume_bridge",
    "events_json_kpis",
    "skew_salted_join_event_kpis",
    "pivot_returnflag_by_linestatus",
    # headline TPC-H shapes + LLM-pipeline representatives. The driver
    # samples the FIRST 50 catalog entries — §2 parity surface,
    # previously-red queries, and one representative per LLM-pipeline
    # family must all fit inside that window, so only three TPC-H
    # representatives ride here (the full Q1-Q22 sweep is verified by
    # tools/compare.py and pytest every round regardless).
    "tpch_q1_pricing_summary",
    "tpch_q9_profit_by_nation_year",
    "window_top3_orders_per_customer",
    "rollup_lineitem_flag_status",
    "events_funnel_view_click_purchase",
    "events_retention_cohorts",
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_hamming",
    "similarity_cosine_top10",
    "similarity_ivf_top5",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "pipeline_llm_corpus_curation",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query submodule so registrations run, then order the
    catalog priority-first (parity + flagship + fragile queries lead)."""
    from healthcare_data_lakehouse_spark.queries import (  # noqa: F401
        advanced,
        analytics,
        behavior,
        etl_queries,
        llm_ops,
        quality_queries,
        semistructured,
        streaming_queries,
    )

    ordered = {n: QUERIES[n] for n in PRIORITY if n in QUERIES}
    ordered.update(QUERIES)
    return ordered
