"""Advanced analytics: bitmap encodings, changepoint detection,
resampling inference, vocabulary-growth laws.

The reference has no analytics surface at all (its ``AGGREGATION`` /
``JOINING`` labels are lineage metadata only, reference
``src/lineage/lineage_tracker.py:45-46``); these queries extend the
engine's statistical/ops toolbox beyond `behavior.py`, each with a
DuckDB oracle.

Scale notes (100 TB design point):
* The activity bitmap packs 63 days of per-user presence into ONE
  int64 — the roaring-bitmap primitive. Audience intersection /
  retention math then becomes bitwise AND + popcount on a
  customer-grain table instead of re-scanning the fact table.
* CUSUM runs its ordered window over the day-grain post-aggregation
  series (|days| rows), never over raw events.
* The Poisson bootstrap (Chamandy et al., Google 2012) replaces B full
  resamples with ONE scan: each row draws an independent Poisson(1)
  replication weight per replicate from a content hash, so the 32
  replicate means come out of a single map-side-combinable aggregate.
  No collect, no per-replicate shuffle, deterministic across engines
  (integer hash-threshold compare, no float RNG).
* Heaps' law fits distinct-vs-total vocabulary growth entirely from
  per-document array statistics (no explode): one scan, one
  regr_slope aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_data_lakehouse_spark.queries.catalog import register
from healthcare_data_lakehouse_spark.tables import table

__all__: list[str] = []


# ------------------------------------------------- per-user activity bitmap
@register(
    "events_user_activity_bitmap",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    first AS (SELECT user_id, MIN(day) AS d0 FROM days GROUP BY user_id),
    idx AS (
        SELECT d.user_id, datediff('day', f.d0, d.day) AS di
        FROM days d JOIN first f ON d.user_id = f.user_id
        WHERE datediff('day', f.d0, d.day) < 63
    )
    SELECT user_id,
           bit_or(1::BIGINT << di) AS bitmap,
           CAST(bit_count(bit_or(1::BIGINT << di)) AS INT) AS active_days,
           CAST(bit_count(bit_or(1::BIGINT << di) & 127) AS INT)
               AS week1_days,
           CAST(floor(log2(bit_or(1::BIGINT << di))) AS INT)
               AS last_day_idx
    FROM idx GROUP BY user_id
    """,
    description="Per-user 63-day retention bitmap: day 0 = the user's "
    "first active day, bit i set iff active on day i. ONE int64 per "
    "user encodes presence (the roaring-bitmap audience primitive): "
    "active_days = popcount, week1_days = popcount(bitmap & 0x7F), "
    "last_day_idx = floor(log2). Downstream audience overlap / "
    "retention queries become bitwise AND + popcount over the "
    "customer-grain table — the fact table is scanned exactly once, "
    "ever. 63 (not 64) days keeps the int64 sign bit clear so the "
    "log2 span math stays exact on both engines.",
)
def events_user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("d0"))
    idx = (
        days.join(first, "user_id")
        .select("user_id", F.datediff("day", "d0").alias("di"))
        .filter(F.col("di") < 63)
    )
    bm = idx.groupBy("user_id").agg(
        F.expr("bit_or(shiftleft(1L, di))").alias("bitmap")
    )
    return bm.select(
        "user_id",
        "bitmap",
        F.bit_count("bitmap").cast("int").alias("active_days"),
        F.bit_count(F.col("bitmap").bitwiseAND(F.lit(127)))
        .cast("int")
        .alias("week1_days"),
        F.floor(F.log2("bitmap")).cast("int").alias("last_day_idx"),
    )


# ---------------------------------------------------- CUSUM changepoint
@register(
    "events_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, SUM(value) AS dv
        FROM events GROUP BY 1
    ),
    m AS (SELECT AVG(dv) AS mean_dv FROM daily),
    cs AS (
        SELECT day, dv,
               SUM(dv - m.mean_dv) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cusum
        FROM daily CROSS JOIN m
    ),
    mx AS (SELECT MAX(ROUND(ABS(cusum), 4)) AS mx FROM cs)
    SELECT day, ROUND(dv, 4) AS daily_value, ROUND(cusum, 4) AS cusum,
           ROUND(ABS(cusum), 4) = mx.mx AS is_changepoint
    FROM cs CROSS JOIN mx
    """,
    description="CUSUM changepoint detection over the daily value "
    "series: cumulative sum of deviations from the series mean; the "
    "day where |CUSUM| peaks is the single most likely level-shift "
    "point (Page 1954). Complements events_value_anomalies (local "
    "z-score spikes) with a GLOBAL structural-break detector. The "
    "ordered window runs over the day-grain post-aggregation series, "
    "never the raw events; the mean and the peak are broadcast "
    "one-row joins. The changepoint flag compares 4-dp-rounded "
    "magnitudes so float summation noise cannot flip it.",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum("value").alias("dv")
    )
    m = daily.agg(F.avg("dv").alias("mean_dv"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cs = daily.crossJoin(F.broadcast(m)).withColumn(
        "cusum", F.sum(F.col("dv") - F.col("mean_dv")).over(w)
    )
    mx = cs.agg(F.max(F.round(F.abs("cusum"), 4)).alias("mx"))
    return cs.crossJoin(F.broadcast(mx)).select(
        "day",
        F.round("dv", 4).alias("daily_value"),
        F.round("cusum", 4).alias("cusum"),
        (F.round(F.abs("cusum"), 4) == F.col("mx")).alias("is_changepoint"),
    )


# ------------------------------------------------- Poisson bootstrap CI
_POIS_THRESHOLDS = (
    103548857136060,
    207097714272121,
    258872142840152,
    276130285696162,
    280444821410164,
    281307728552965,
)


def _poisson_case(h: str) -> str:
    """Integer-threshold inverse-CDF of Poisson(1) on a hash in [0, 16^12)."""
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_THRESHOLDS)
    )
    return f"CASE {branches} ELSE 6 END"


@register(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
        SELECT o.o_totalprice AS x, t.r,
               {_poisson_case("CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || ':' || CAST(t.r AS VARCHAR)), 1, 12)) AS BIGINT)")} AS w
        FROM orders o CROSS JOIN UNNEST(generate_series(0, 31)) AS t(r)
    ),
    boot AS (
        SELECT r, ROUND(SUM(w * x) / SUM(w), 6) AS mean_r
        FROM reps GROUP BY r
    ),
    pt AS (SELECT COUNT(*) AS n_orders, AVG(o_totalprice) AS m FROM orders)
    SELECT pt.n_orders,
           ROUND(pt.m, 4) AS point_mean,
           ROUND(STDDEV_SAMP(mean_r), 4) AS boot_se,
           ROUND(quantile_cont(mean_r, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(mean_r, 0.975), 4) AS ci_hi
    FROM boot CROSS JOIN pt
    GROUP BY pt.n_orders, pt.m
    """,
    description="Poisson-bootstrap 95% CI for mean order value "
    "(Chamandy et al., 'Estimating Uncertainty for Massive Data "
    "Streams', Google 2012): instead of materializing 32 resamples, "
    "each (order, replicate) draws an independent Poisson(1) weight "
    "from an integer md5 threshold — the binomial(n, 1/n) resample "
    "count converges to Poisson(1) at scale and needs no global n. "
    "One explode×32 scan, one grouped aggregate, 32 replicate means; "
    "SE and percentile CI come from the 32-row table. Fully "
    "deterministic across engines: the weight compare is integer-"
    "integer, no float RNG anywhere.",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    h = (
        "CAST(conv(substr(md5(concat(CAST(o_orderkey AS STRING), ':', "
        "CAST(r AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )
    reps = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("x"),
        F.explode(F.expr("sequence(0, 31)")).alias("r"),
    ).withColumn("w", F.expr(_poisson_case(h)))
    boot = reps.groupBy("r").agg(
        F.round(F.sum(F.col("w") * F.col("x")) / F.sum("w"), 6).alias("mean_r")
    )
    pt = orders.agg(
        F.count(F.lit(1)).alias("n_orders"), F.avg("o_totalprice").alias("m")
    )
    return (
        boot.crossJoin(F.broadcast(pt))
        .groupBy("n_orders", "m")
        .agg(
            F.round(F.stddev_samp("mean_r"), 4).alias("boot_se"),
            F.round(F.expr("percentile(mean_r, 0.025)"), 4).alias("ci_lo"),
            F.round(F.expr("percentile(mean_r, 0.975)"), 4).alias("ci_hi"),
        )
        .select(
            "n_orders",
            F.round("m", 4).alias("point_mean"),
            "boot_se",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------- Heaps' law fit
@register(
    "text_heaps_law_fit",
    oracle="""
    WITH per_doc AS (
        SELECT len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                   x -> x <> '')) AS total,
               len(list_distinct(list_filter(
                   string_split_regex(lower(text), '[^a-z]+'),
                   x -> x <> ''))) AS uniq
        FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           ROUND(AVG(CAST(uniq AS DOUBLE) / total), 4) AS avg_ttr,
           ROUND(regr_slope(ln(uniq), ln(total)), 4) AS heaps_beta,
           ROUND(exp(regr_intercept(ln(uniq), ln(total))), 4) AS heaps_k
    FROM per_doc WHERE total > 0 AND uniq > 0
    """,
    description="Heaps'-law vocabulary-growth fit: distinct-token "
    "count grows as K·n^beta with document length; beta (the log-log "
    "regr_slope) and K characterize corpus lexical diversity — the "
    "companion diagnostic to text_zipf_slope (rank-frequency) and a "
    "standard repetitive/templated-text detector for pretraining "
    "curation (low beta = boilerplate). Token and distinct counts "
    "come from array functions on the text column (split / filter / "
    "array_distinct) with ZERO explode — one scan, one regression "
    "aggregate, map-side combinable running moments.",
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(lower(text), '[^a-z]+'), x -> x <> '')")
    per_doc = docs.select(
        F.size(toks).alias("total"),
        F.size(F.array_distinct(toks)).alias("uniq"),
    ).filter("total > 0 AND uniq > 0")
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("uniq").cast("double") / F.col("total")), 4).alias(
            "avg_ttr"
        ),
        F.round(F.expr("regr_slope(ln(uniq), ln(total))"), 4).alias(
            "heaps_beta"
        ),
        F.round(F.exp(F.expr("regr_intercept(ln(uniq), ln(total))")), 4).alias(
            "heaps_k"
        ),
    )
