"""Physical-plan regression tests: the optimizations the 100 TB design
depends on must be visible in the executed plan, not assumed.

Pinned to pyspark 4.x plan strings; if a Spark upgrade changes plan
rendering these assertions flag it for review rather than silently losing
pushdown/codegen.
"""

from __future__ import annotations

from healthcare_data_lakehouse_spark.queries.catalog import load_all


def _plan(spark, sf_dir, name: str) -> str:
    df = load_all()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_into_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # the selective predicates reach the reader, not just the Filter node
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    assert "l_discount" in plan.split("PushedFilters", 1)[1][:400]


def test_q1_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    # 7 of 11 lineitem columns read; pruned schema must exclude keys
    rs = plan.split("ReadSchema", 1)[1][:400]
    assert "l_orderkey" not in rs and "l_partkey" not in rs


def test_q1_single_shuffle_partial_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    assert plan.count("Exchange hashpartitioning") == 1  # partial agg merged once
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_q14_part_dim_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q14_promo_revenue")
    assert "BroadcastHashJoin" in plan  # dim rides a broadcast, fact never shuffles


def test_text_quality_is_narrow(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_quality_scores")
    # pure per-row scoring: no shuffle at all
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in hot path
