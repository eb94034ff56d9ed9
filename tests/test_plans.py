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


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """With broadcast off (the 100 TB big-join regime), Catalyst injects a
    bloom filter built from the selective dim side and pushes might_contain
    onto the fact scan — rows drop before the shuffle, not after."""
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_spark.tables import table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        li = table(spark, sf_dir, "lineitem")
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout + a partition-key predicate must show
    up as PartitionFilters on the scan (directory-level data skipping —
    the mechanism that turns a 100 TB scan into a single-day scan)."""
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_spark.tables import table

    out = str(tmp_path / "events_by_day")
    events = table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    events.write.partitionBy("day").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.select(F.max("day").alias("d")).first()["d"]
    q = back.filter(F.col("day") == F.lit(one_day)).select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters", 1)
    assert len(seg) == 2 and "day" in seg[1][:200]
    # pruning is real: multiple day directories exist, the filtered read
    # returns a strict subset
    n_days = back.select("day").distinct().count()
    assert n_days > 1
    assert 0 < q.count() < back.count()


def test_hof_array_stats_has_no_explode_no_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_array_stats_hof")
    # the per-document stats stay inside the array column: no Generate
    # (explode) widening the row count, no Python eval in the plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_variant_extract_is_jvm_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_props_variant_stats")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # map-side combine before the single shuffle on event_type
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_unpivot_expands_after_aggregate(spark, sf_dir):
    df = load_all()["unpivot_lineitem_metrics"].fn(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # melt must sit above the aggregate: Expand's child contains Aggregate,
    # so the 3x row expansion applies to |returnflags| rows, not the scan
    assert "Expand" in optimized
    assert optimized.index("Expand") < optimized.index("Aggregate")


def test_join_strategy_hints_control_physical_plan(spark, sf_dir):
    """The engine can override Catalyst's join choice per query: MERGE
    forces sort-merge even under broadcast thresholds, SHUFFLE_HASH forces
    a hash join — the knobs for known-skew or known-huge sides at 100 TB."""
    import pyspark.sql.functions as F

    from healthcare_data_lakehouse_spark.tables import table

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    smj = orders.join(
        customer.hint("merge"), orders.o_custkey == customer.c_custkey
    )
    plan = smj._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan

    shj = orders.join(
        customer.hint("shuffle_hash"), orders.o_custkey == customer.c_custkey
    )
    plan = shj._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan

    bc = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # all three strategies compute the same join
    n = bc.count()
    assert smj.count() == n and shj.count() == n


def test_decontamination_eval_side_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pipeline_decontaminate_train")
    # the eval span set must reach the train scan as a broadcast, and the
    # span join must stay a (semi) hash join, never sort-merge the spans
    assert "BroadcastExchange" in plan
    assert "LeftSemi, BuildRight" in plan


def test_profiler_is_one_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "quality_profile_events_columns")
    # one aggregation over one scan: N columns profiled without N passes
    assert plan.count("Scan parquet") == 1


def test_matryoshka_audit_no_shuffle_before_rollup(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embedding_matryoshka_fidelity")
    # only the 10-row label rollup exchanges; the slice/norm math is narrow
    assert plan.count("Exchange hashpartitioning") == 1


def test_flagship_survives_broadcast_disabled(spark, sf_dir):
    """At 100 TB the dimension tables can exceed the broadcast threshold;
    the same code must degrade to sort-merge/shuffled-hash and stay
    correct — AQE picks the strategy from runtime stats, the query text
    never changes."""
    from healthcare_data_lakehouse_spark.queries.catalog import load_all

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fn = load_all()["gold_revenue_by_mktsegment"].fn
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows = {r.mktsegment: r.revenue for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # no broadcast anywhere; a shuffle-side join strategy took over
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # and the answer matches the broadcast plan's
    base = {r.mktsegment: r.revenue for r in fn(spark, sf_dir).collect()}
    assert rows == base


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """AQE merges the 32 configured shuffle partitions down to what the
    data volume actually needs — the runtime re-plan the 100 TB design
    leans on instead of hand-tuning spark.sql.shuffle.partitions per
    query."""
    from healthcare_data_lakehouse_spark.queries.catalog import load_all

    df = load_all()["gold_revenue_by_mktsegment"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the plan only after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_bucketed_join_has_no_exchange_on_join_inputs(spark, sf_dir):
    """join_bucketed_colocated: both sides bucketed on the join key, so the
    sort-merge join must consume the bucketed scans directly — the only
    exchange in the plan is the final per-segment aggregate's."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the bucketed-scan property is what's under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(spark, sf_dir, "join_bucketed_colocated")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    # below the join: scans only, no redistribution of either input
    assert "Exchange hashpartitioning" not in join_part
    # one exchange total (the 5-row aggregate), never a fact-table shuffle
    assert plan.count("Exchange hashpartitioning") <= 1


def test_pq_encode_is_narrow_no_python_no_shuffle(spark, sf_dir):
    # PQ top-5: one projection pass against plan-literal codebooks +
    # TakeOrdered; any BatchEvalPython or Exchange would break the
    # 0-shuffle scale contract
    plan = _plan(spark, sf_dir, "similarity_pq_adc_top5")
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan


def test_token_budget_mix_single_source_shuffle(spark, sf_dir):
    # corpus-side work shuffles on `source` only (window cumsum); the
    # budget table rides in as a broadcast
    plan = _plan(spark, sf_dir, "pipeline_token_budget_mix")
    assert "BatchEvalPython" not in plan
    assert "BroadcastExchange" in plan
