"""Semantic invariants for the advanced analytics queries (sf0.001).

The oracle gate proves Spark == DuckDB; these tests prove both are
*right*: bitmap popcounts reconcile with the distinct-day counts,
CUSUM telescopes to ~0 and flags exactly the peak, bootstrap CI
brackets the point estimate at a plausible width, Heaps' beta lands
in the sublinear band real text occupies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_lakehouse_spark.queries import advanced
from healthcare_data_lakehouse_spark.tables import table


def test_activity_bitmap_popcount_matches_distinct_days(spark, sf_dir):
    rows = advanced.events_user_activity_bitmap(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    days = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.datediff(F.max("day"), F.min("day")).alias("span"),
        )
    )
    truth = {r.user_id: r for r in days.collect()}
    for r in rows:
        assert r.bitmap > 0  # sign bit never set (63-day cap)
        assert r.bitmap & 1  # day 0 is the user's own first day
        t = truth[r.user_id]
        # popcount == distinct days, when all fall inside the 63-day window
        if t.span < 63:
            assert r.active_days == t.n_days
            assert r.last_day_idx == t.span
        else:
            assert r.active_days <= t.n_days
            assert r.last_day_idx < 63
        assert 1 <= r.week1_days <= min(7, r.active_days)


def test_cusum_telescopes_and_flags_unique_peak(spark, sf_dir):
    rows = sorted(
        advanced.events_changepoint_cusum(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) > 5
    # sum of deviations over the whole series telescopes to zero
    assert abs(rows[-1].cusum) < 1e-2
    peak = max(abs(r.cusum) for r in rows)
    flagged = [r for r in rows if r.is_changepoint]
    assert flagged and all(abs(r.cusum) == peak for r in flagged)
    # running property: cusum_t - cusum_{t-1} = dv_t - mean
    mean = sum(r.daily_value for r in rows) / len(rows)
    for prev, cur in zip(rows, rows[1:]):
        assert abs((cur.cusum - prev.cusum) - (cur.daily_value - mean)) < 0.05


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    (r,) = advanced.stats_bootstrap_ci(spark, sf_dir).collect()
    orders = table(spark, sf_dir, "orders")
    assert r.n_orders == orders.count()
    assert r.ci_lo < r.point_mean < r.ci_hi
    assert r.boot_se > 0
    # CI width should be a few SEs, not degenerate and not absurd
    assert (r.ci_hi - r.ci_lo) < 10 * r.boot_se
    # bootstrap SE tracks sigma/sqrt(n) within a loose factor
    import math

    sd = orders.agg(F.stddev_samp("o_totalprice")).first()[0]
    theory = sd / math.sqrt(r.n_orders)
    assert theory / 3 < r.boot_se < theory * 3


def test_heaps_beta_sublinear(spark, sf_dir):
    (r,) = advanced.text_heaps_law_fit(spark, sf_dir).collect()
    assert r.n_docs > 0
    assert 0 < r.heaps_beta <= 1.0  # vocabulary grows sublinearly
    assert r.heaps_k > 0
    assert 0 < r.avg_ttr <= 1.0


def test_sweepline_concurrency_bounded_by_active_users(spark, sf_dir):
    rows = advanced.events_concurrent_sessions_sweepline(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    # a user has at most one session open at a time, so peak concurrency
    # on any day never exceeds that day's (or any) distinct user count
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r.peak_concurrent <= n_users
        assert r.n_boundaries > 0
    # global invariant: total +1s == total -1s == number of sessions
    assert max(r.peak_concurrent for r in rows) >= 1


def test_dictionary_audit_covers_all_columns(spark, sf_dir):
    rows = {r.col_name: r for r in
            advanced.storage_dictionary_encoding_audit(spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem")
    assert set(rows) == set(li.columns)
    n = li.count()
    for r in rows.values():
        assert r.n_values == n  # no nulls in the fixture
        assert 1 <= r.n_distinct <= n
        assert (2 ** r.dict_bits) >= r.n_distinct
        assert r.est_ratio > 0
    # flag columns are the canonical dictionary wins
    assert rows["l_returnflag"].n_distinct <= 3
    assert rows["l_returnflag"].dict_bits <= 2
    assert rows["l_orderkey"].n_distinct == li.select("l_orderkey").distinct().count()


def test_wilson_interval_brackets_rate_and_tightens_with_n(spark, sf_dir):
    rows = advanced.stats_wilson_ci_purchase_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1
        assert r.purchases <= r.trials
    # wider interval for smaller n at comparable rates (spot: min vs max n)
    small = min(rows, key=lambda r: r.trials)
    big = max(rows, key=lambda r: r.trials)
    if big.trials > 3 * small.trials:
        assert (small.wilson_hi - small.wilson_lo) > (
            big.wilson_hi - big.wilson_lo
        ) * 0.8


def test_chisq_cells_reconcile_and_residuals_sum(spark, sf_dir):
    rows = advanced.stats_chisq_lang_source(spark, sf_dir).collect()
    assert rows
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.observed for r in rows) == n_docs
    # expected counts reproduce the same total, and chi2 equals the
    # sum of squared residuals (within rounding)
    assert abs(sum(r.expected for r in rows) - n_docs) < 0.1
    chi2 = rows[0].chi2_total
    assert all(r.chi2_total == chi2 for r in rows)
    assert abs(sum(r.std_residual**2 for r in rows) - chi2) < 0.5
    assert rows[0].df >= 1


def test_mutual_info_bounded_by_entropies(spark, sf_dir):
    (r,) = advanced.stats_mutual_info_type_hour(spark, sf_dir).collect()
    assert r.mi_bits >= 0
    import math

    # MI <= min(H(X), H(Y)) <= log2 of the smaller cardinality
    assert r.mi_bits <= math.log2(min(r.n_types, r.n_hours)) + 1e-6
    assert r.h_joint <= math.log2(r.n_types * r.n_hours) + 1e-6


def test_kaplan_meier_monotone_from_one(spark, sf_dir):
    rows = sorted(
        advanced.stats_kaplan_meier_session_duration(spark, sf_dir).collect(),
        key=lambda r: r.dur_minutes,
    )
    assert rows
    surv = [r.km_survival for r in rows]
    assert all(0 <= s <= 1 for s in surv)
    assert surv == sorted(surv, reverse=True)  # survival never increases
    assert surv[0] < 1.0  # first death time drops below 1
    # risk set shrinks as duration grows
    risk = [r.n_at_risk for r in rows]
    assert risk == sorted(risk, reverse=True)
    assert all(r.n_ended <= r.n_at_risk for r in rows)


def test_anova_decomposition_consistent(spark, sf_dir):
    (r,) = advanced.stats_anova_value_by_type(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    assert r.n_groups == ev.select("event_type").distinct().count()
    assert r.n_obs == ev.count()
    assert r.ss_between >= 0 and r.ss_within > 0
    assert r.f_stat >= 0
    # eta^2 = SSB / (SSB + SSW) by definition
    assert abs(r.eta_squared - r.ss_between / (r.ss_between + r.ss_within)) < 1e-3


def test_theil_sen_matches_ols_on_clean_series(spark, sf_dir):
    (r,) = advanced.stats_theil_sen_daily_trend(spark, sf_dir).collect()
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    # synthetic revenue has no gross outliers: the two estimators agree
    # in sign-or-near-zero and the robust one is finite
    assert r.theil_sen_slope is not None and r.ols_slope is not None
    daily_rev_scale = abs(r.ols_slope) + 1.0
    assert abs(r.theil_sen_slope - r.ols_slope) < max(100.0, 50 * daily_rev_scale)


def test_lateral_topk_decorrelates_to_window_group_limit(spark, sf_dir):
    df = advanced.lateral_top2_acctbal_per_nation(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst must rewrite the correlated lateral into a windowed
    # top-k, not re-execute the subquery per outer row
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    n_nations = table(spark, sf_dir, "nation").count()
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r.acctbal)
    assert len(by_nation) <= n_nations
    for vals in by_nation.values():
        assert len(vals) <= 2
        assert vals == sorted(vals, reverse=True)


def test_penny_allocation_always_exact(spark, sf_dir):
    df = advanced.finance_penny_allocation(spark, sf_dir)
    rows = df.collect()
    assert rows
    # THE invariant: every order's cent allocation reconciles exactly
    assert all(r.exact_match for r in rows)
    assert all(abs(r.allocated_total - r.order_total) < 0.005 for r in rows)
    li = table(spark, sf_dir, "lineitem")
    assert sum(r.n_lines for r in rows) == li.count()


def test_cohort_ltv_monotone_within_cohort(spark, sf_dir):
    rows = advanced.orders_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(
            (r.month_offset, r.ltv_per_customer, r.cohort_customers)
        )
    n_cust = table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(v[0][2] for v in by_cohort.values()) == n_cust
    for cohort, pts in by_cohort.items():
        pts.sort()
        assert pts[0][0] == 0, cohort  # offset 0 always present
        ltvs = [p[1] for p in pts]
        assert ltvs == sorted(ltvs), cohort  # cumulative LTV never drops
        assert ltvs[0] > 0


def test_brand_rank_shift_rank_consistency(spark, sf_dir):
    rows = advanced.brand_rank_shift_quarterly(spark, sf_dir).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.qtr, []).append(r)
    for qtr, rs in by_q.items():
        ranks = sorted(r.rnk for r in rs)
        assert ranks[0] == 1, qtr
        # rank 1 has the max revenue
        top = max(rs, key=lambda r: r.revenue)
        assert min(rs, key=lambda r: r.rnk).revenue == top.revenue
    # rank_change is null exactly on each brand's first quarter
    by_brand: dict = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    for brand, rs in by_brand.items():
        rs.sort(key=lambda r: r.qtr)
        assert rs[0].rank_change is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur.rank_change == prev.rnk - cur.rnk


def test_twopass_median_equals_sorted_kth(spark, sf_dir):
    (r,) = advanced.stats_twopass_exact_median(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    vals = sorted(x[0] for x in li.select("l_extendedprice").collect())
    k = (len(vals) + 1) // 2
    assert r.n == len(vals)
    assert r.exact_median == vals[k - 1]  # exact element, not interpolated


def test_attribution_journeys_reconcile_with_purchases(spark, sf_dir):
    rows = advanced.events_attribution_first_vs_last(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    total_journeys = sum(r.journeys for r in rows)
    # every counted journey precedes a purchase; purchases with no
    # prior non-purchase event produce no journey
    assert 0 < total_journeys <= n_purchases
    types = set(
        t[0] for t in ev.select("event_type").distinct().collect()
    ) - {"purchase"}
    for r in rows:
        assert r.first_touch in types and r.last_touch in types


def test_price_volume_bridge_reconciles_exactly(spark, sf_dir):
    rows = advanced.finance_price_volume_bridge(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the bridge identity: volume + price effects == delta, residual 0
        assert abs(r.residual) < 0.02, r.segment
        assert abs((r.volume_effect + r.price_effect) - r.delta) <= 0.03
        assert abs(r.delta - (r.rev_1998 - r.rev_1997)) < 0.02


def test_assortativity_in_valid_range(spark, sf_dir):
    (r,) = advanced.graph_degree_assortativity_coparts(spark, sf_dir).collect()
    assert r.n_edges > 0 and r.n_nodes > 0
    assert r.mean_edge_degree >= 1
    if r.assortativity is not None:
        assert -1.0 <= r.assortativity <= 1.0


def test_sampled_pairwise_distance_brackets(spark, sf_dir):
    (r,) = advanced.embedding_sampled_pairwise_distance(spark, sf_dir).collect()
    assert r.n_pairs > 1900  # a few self-pairs excluded
    assert 0 <= r.mean_cos_dist <= 2
    assert r.ci_lo <= r.mean_cos_dist <= r.ci_hi
    assert r.sd_cos_dist > 0


def test_monte_carlo_var_close_to_normal_theory(spark, sf_dir):
    (r,) = advanced.stats_monte_carlo_var(spark, sf_dir).collect()
    assert r.n_draws == 10000
    assert r.sigma > 0
    # with 10k gaussian draws the MC estimate lands within ~5% of the
    # closed form — this validates the hash-seeded Box-Muller harness
    assert abs(r.var95_mc - r.var95_normal) / r.var95_normal < 0.05


def test_table_checksum_detects_any_row_change(spark, sf_dir):
    rows = {r.table_name: r for r in
            advanced.quality_table_checksum(spark, sf_dir).collect()}
    assert set(rows) == {"region", "nation", "customer"}
    for t, r in rows.items():
        assert r.n_rows == table(spark, sf_dir, t).count(), t
        assert r.checksum != 0
    # sensitivity: recomputing over customer minus one row changes the
    # digest (xor of the removed row's hash re-surfaces)
    cust = table(spark, sf_dir, "customer")
    sub = cust.filter(F.col("c_custkey") != 1)
    h = (
        "bit_xor(CAST(conv(substr(md5(concat_ws('|', c_custkey, c_name, "
        "c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING), "
        "c_mktsegment)), 1, 15), 16, 10) AS BIGINT))"
    )
    full_ck = rows["customer"].checksum
    sub_ck = sub.agg(F.expr(h)).first()[0]
    assert sub_ck != full_ck


def test_cramers_v_matches_bruteforce(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from healthcare_data_lakehouse_spark.queries.advanced import (
        stats_cramers_v_lang_source,
    )

    r = stats_cramers_v_lang_source(spark, sf_dir).collect()[0]

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ct = pd.crosstab(docs["lang"], docs["source"])
    o = ct.to_numpy().astype(float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = ((o - e) ** 2 / e).sum()
    rr, cc = o.shape
    v = np.sqrt(chi2 / n / min(rr - 1, cc - 1))
    phi2_t = max(0.0, chi2 / n - (rr - 1) * (cc - 1) / (n - 1))
    r_t = rr - (rr - 1) ** 2 / (n - 1)
    c_t = cc - (cc - 1) ** 2 / (n - 1)
    v_t = np.sqrt(phi2_t / min(r_t - 1, c_t - 1))

    assert r.n_docs == int(n) and r.n_langs == rr and r.n_sources == cc
    assert abs(r.chi2 - chi2) < 1e-2
    assert abs(r.cramers_v - v) < 1e-5
    assert abs(r.cramers_v_corrected - v_t) < 1e-5
    assert 0.0 <= r.cramers_v <= 1.0


def test_nelson_aalen_dominates_km_and_matches_bruteforce(spark, sf_dir):
    from healthcare_data_lakehouse_spark.queries.advanced import (
        stats_kaplan_meier_session_duration,
        stats_nelson_aalen_cumhaz,
    )

    na = sorted(
        stats_nelson_aalen_cumhaz(spark, sf_dir).collect(),
        key=lambda r: r.dur_minutes,
    )
    km = {
        r.dur_minutes: r.km_survival
        for r in stats_kaplan_meier_session_duration(spark, sf_dir).collect()
    }
    assert na
    # identical event-time grid as KM (same sessionization + censoring)
    assert {r.dur_minutes for r in na} == set(km)
    prev_h = 0.0
    h = 0.0
    for r in na:
        # hazard is the running sum of d/n over event times
        h += r.n_ended / r.n_at_risk
        assert abs(r.na_cum_hazard - h) < 1e-3
        assert r.na_cum_hazard >= prev_h  # monotone non-decreasing
        prev_h = r.na_cum_hazard
        # Fleming-Harrington >= Kaplan-Meier pointwise (1-x <= exp(-x))
        assert r.fh_survival >= km[r.dur_minutes] - 1e-9
        assert r.na_variance >= 0
