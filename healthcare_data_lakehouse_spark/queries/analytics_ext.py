"""Extended analytics query family: sketches, graph, forecasting, windows (split from analytics.py).

Mechanically split from queries/analytics.py (round 8); blocks moved
verbatim in original order — zero behavior change. See analytics.py for
the compatibility facade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_data_lakehouse_spark.functions import dround, dround_sql
from healthcare_data_lakehouse_spark.queries.catalog import register
from healthcare_data_lakehouse_spark.tables import table



# ------------------------------------------------------------- anti join
@register(
    "anti_join_parts_no_bulk_orders",
    oracle="""
    SELECT p.p_type AS part_type,
           COUNT(*) AS n_parts,
           ROUND(SUM(p.p_retailprice), 2) AS sum_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 48
    )
    GROUP BY p.p_type
    """,
    description="NOT EXISTS as LEFT ANTI join: parts never ordered in bulk "
    "(quantity > 48); the lineitem side is pre-filtered so the anti join "
    "probes a small build set.",
)
def anti_join_parts_no_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    bulk = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    return (
        part.join(bulk, bulk.l_partkey == part.p_partkey, "left_anti")
        .groupBy(F.col("p_type").alias("part_type"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("sum_retailprice"),
        )
    )


# -------------------------------------------------------------- sketches
@register(
    "sketch_hll_distinct_users",
    # Bounded-error oracle (VERDICT r10 ask #4): the HLL estimate itself is
    # engine-specific, but the oracle computes the EXACT NDV in SQL and the
    # Spark side asserts |approx - exact| / exact <= 3 * rsd (rsd = 0.02,
    # so a 6% band — approx_count_distinct's documented relative standard
    # deviation, tripled for a deterministic-pass margin; the observed
    # error on the fixed fixtures is <1%). A drifting estimate flips
    # within_3rsd to FALSE and the value-hash compare fails.
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_3rsd
    FROM events GROUP BY event_type
    """,
    description="HyperLogLog++ NDV sketch per event_type "
    "(approx_count_distinct): mergeable fixed-size state, the 100 TB path "
    "for cardinality where exact countDistinct's expand+shuffle is "
    "unaffordable. Bounded-error check: the sketch estimate must land "
    "within 3x its rsd (6%) of the exact count, asserted per group.",
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.02).cast("double")
                - F.countDistinct("user_id").cast("double")
            )
            <= 0.06 * F.countDistinct("user_id").cast("double")
        ).alias("within_3rsd"),
    )


@register(
    "sketch_hll_mergeable_daily_rollup",
    oracle="""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    hashed AS (
        SELECT day,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM ev
    ),
    regs AS (
        SELECT day, h % 256 AS reg,
               CASE WHEN h // 256 > 0
                    THEN 53 - length(bin(h // 256)) ELSE 53 END AS rho
        FROM hashed
    ),
    daily AS (
        SELECT day, reg, MAX(rho) AS m FROM regs GROUP BY day, reg
    ),
    days AS (SELECT DISTINCT day FROM daily),
    cum AS (
        SELECT d.day, m.reg, MAX(m.m) AS m
        FROM days d JOIN daily m ON m.day <= d.day
        GROUP BY d.day, m.reg
    ),
    z AS (
        SELECT day,
               SUM(CAST(POW(2.0, 53 - m) AS BIGINT)) AS z_present,
               COUNT(*) AS n_present
        FROM cum GROUP BY day
    ),
    firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    exact AS (
        SELECT d.day, COUNT(*) AS exact_cum_users
        FROM days d JOIN firsts f ON f.first_day <= d.day
        GROUP BY d.day
    )
    ,raw AS (
        SELECT day, n_present,
               ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
               * 9007199254740992.0
               / (z_present + (256 - n_present) * 9007199254740992) AS e_raw
        FROM z
    )
    SELECT r.day,
           CAST(ROUND(CAST(
               CASE WHEN r.e_raw <= 640.0 AND r.n_present < 256
                    THEN 256.0 * LN(256.0 / (256 - r.n_present))
                    ELSE r.e_raw END
               AS DECIMAL(38,8)), 2) AS DOUBLE) AS est_cum_users,
           CAST(e.exact_cum_users AS BIGINT) AS exact_cum_users
    FROM raw r JOIN exact e ON e.day = r.day
    """,
    description="Mergeable HyperLogLog built from PLAIN DataFrame ops — "
    "the sketch-algebra pattern exact distinct cannot offer at 100 TB: "
    "each event hashes (engine-portable md5 bits) into one of 256 "
    "registers with a leading-zero rank, a day's sketch is just the "
    "(day, register, max-rank) table (one map-side-combinable groupBy), "
    "and MERGING sketches across days is MAX over registers — so the "
    "day-N cumulative-distinct estimate needs only the O(days x 256) "
    "register table, never a re-scan of history (the union-state "
    "property that makes sketch columns storable per partition and "
    "rolled up at query time). Harmonic-mean estimation is kept in "
    "INTEGER space (sum of 2^(53-rank) as bigint) so both engines "
    "compute bit-identical estimates — oracle-hash-verified, with the "
    "exact cumulative distinct carried alongside as ground truth.",
)
def sketch_hll_mergeable_daily_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = table(spark, sf_dir, "events")
    ev = events.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = ev.select("day", h.alias("h"))
    regs = hashed.select(
        "day",
        (F.col("h") % 256).alias("reg"),
        F.when(
            F.expr("h div 256") > 0,
            F.lit(53) - F.length(F.bin(F.expr("h div 256"))),
        )
        .otherwise(53)
        .alias("rho"),
    )
    daily = regs.groupBy("day", "reg").agg(F.max("rho").alias("m"))
    days = daily.select("day").distinct()
    cum = (
        days.alias("d")
        .join(daily.alias("m"), F.col("m.day") <= F.col("d.day"))
        .groupBy(F.col("d.day").alias("day"), F.col("m.reg").alias("reg"))
        .agg(F.max("m.m").alias("m"))
    )
    z = cum.groupBy("day").agg(
        F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("m")).cast("bigint")).alias(
            "z_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    exact = (
        days.alias("d")
        .join(
            F.broadcast(firsts).alias("f"),
            F.col("f.first_day") <= F.col("d.day"),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count(F.lit(1)).alias("exact_cum_users"))
    )
    e_raw = (
        F.lit((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
        * F.lit(9007199254740992.0)
        / (
            F.col("z_present")
            + (F.lit(256) - F.col("n_present")) * F.lit(9007199254740992)
        )
    )
    # linear-counting correction for the small-cardinality regime
    # (Flajolet et al.: when E <= 2.5m, count empty registers instead)
    est = F.when(
        (e_raw <= 640.0) & (F.col("n_present") < 256),
        F.lit(256.0) * F.log(F.lit(256.0) / (F.lit(256) - F.col("n_present"))),
    ).otherwise(e_raw)
    return (
        z.join(exact, "day")
        .select(
            "day",
            dround(est, 2).alias("est_cum_users"),
            F.col("exact_cum_users").cast("bigint").alias("exact_cum_users"),
        )
    )


@register(
    "sketch_histogram_quantiles",
    oracle="""
    WITH binned AS (
        SELECT o_orderpriority AS priority,
               CAST(FLOOR(o_totalprice / 500) AS BIGINT) AS bin,
               COUNT(*) AS c
        FROM orders GROUP BY 1, 2
    ),
    cum AS (
        SELECT priority, bin, c,
               CAST(SUM(c) OVER (PARTITION BY priority ORDER BY bin
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(c) OVER (PARTITION BY priority) AS BIGINT) AS n
        FROM binned
    ),
    p50 AS (
        SELECT priority, MIN(bin) AS b, MAX(n) AS n FROM cum
        WHERE cum >= CAST(CEIL(0.5 * n) AS BIGINT) GROUP BY priority
    ),
    p90 AS (
        SELECT priority, MIN(bin) AS b FROM cum
        WHERE cum >= CAST(CEIL(0.9 * n) AS BIGINT) GROUP BY priority
    )
    SELECT p50.priority, p50.n AS n_orders,
           CAST((p50.b + 0.5) * 500 AS DOUBLE) AS approx_p50,
           CAST((p90.b + 0.5) * 500 AS DOUBLE) AS approx_p90
    FROM p50 JOIN p90 ON p90.priority = p50.priority
    """,
    description="Mergeable fixed-width-histogram quantile sketch (the "
    "third sketch family beside HLL and CMS): per-key totalprice "
    "distributions reduce to (key, bin, count) — one map-side-combinable "
    "groupBy whose state is O(keys x bins) regardless of row count, and "
    "MERGING two sketches is adding bin counts, so per-partition/per-day "
    "histograms roll up without re-scanning history (same union-algebra "
    "argument as the HLL rollup). Quantiles read off the bin CDF: "
    "smallest bin whose cumulative count reaches ceil(q*n), estimate = "
    "bin midpoint (error bounded by bin width/2). All selection logic in "
    "INTEGER space so both engines agree bit-for-bit — unlike "
    "approx_percentile, whose t-digest state is engine-private.",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    binned = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") / 500).cast("bigint").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("priority")
    cum = binned.select(
        "priority",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )

    # both quantiles read off ONE CDF pass: min bin whose cumulative count
    # reaches the target, as conditional MINs in a single aggregate (a
    # filter+groupBy per quantile would recompute the whole CDF branch)
    def _hit(q: float):
        return F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
            F.col("bin"),
        )

    return (
        cum.groupBy("priority")
        .agg(
            F.max("n").alias("n_orders"),
            F.min(_hit(0.5)).alias("b50"),
            F.min(_hit(0.9)).alias("b90"),
        )
        .select(
            "priority",
            "n_orders",
            ((F.col("b50") + 0.5) * 500).alias("approx_p50"),
            ((F.col("b90") + 0.5) * 500).alias("approx_p90"),
        )
    )


_HLL_EST_SQL = """
        CASE WHEN ({raw}) <= 640.0 AND ({np}) < 256
             THEN 256.0 * LN(256.0 / (256 - ({np})))
             ELSE ({raw}) END
"""


def _hll_raw_sql(zp: str, np: str) -> str:
    return (
        "((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0) * 9007199254740992.0 "
        f"/ (({zp}) + (256 - ({np})) * 9007199254740992)"
    )


def _hll_est_col(z_present, n_present):
    """Corrected HLL estimate from integer register aggregates (Column)."""
    raw = (
        F.lit((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
        * F.lit(9007199254740992.0)
        / (z_present + (F.lit(256) - n_present) * F.lit(9007199254740992))
    )
    return F.when(
        (raw <= 640.0) & (n_present < 256),
        F.lit(256.0) * F.log(F.lit(256.0) / (F.lit(256) - n_present)),
    ).otherwise(raw)


@register(
    "sketch_hll_audience_overlap",
    oracle=f"""
    WITH ev AS (
        SELECT event_type AS t, user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    regs AS (
        SELECT t, h % 256 AS reg,
               MAX(CASE WHEN h // 256 > 0
                        THEN 53 - length(bin(h // 256)) ELSE 53 END) AS m
        FROM ev GROUP BY t, reg
    ),
    pairs(ta, tb) AS (
        VALUES ('click', 'purchase'), ('click', 'view'), ('purchase', 'view')
    ),
    uni AS (
        SELECT p.ta, p.tb, r.reg, MAX(r.m) AS m
        FROM pairs p JOIN regs r ON r.t = p.ta OR r.t = p.tb
        GROUP BY p.ta, p.tb, r.reg
    ),
    zu AS (
        SELECT ta, tb,
               SUM(CAST(POW(2.0, 53 - m) AS BIGINT)) AS zp,
               COUNT(*) AS np
        FROM uni GROUP BY ta, tb
    ),
    zt AS (
        SELECT t, SUM(CAST(POW(2.0, 53 - m) AS BIGINT)) AS zp,
               COUNT(*) AS np
        FROM regs GROUP BY t
    ),
    est AS (
        SELECT zu.ta, zu.tb,
               {_HLL_EST_SQL.format(raw=_hll_raw_sql("zu.zp", "zu.np"), np="zu.np")}
                   AS e_union,
               {_HLL_EST_SQL.format(raw=_hll_raw_sql("za.zp", "za.np"), np="za.np")}
                   AS e_a,
               {_HLL_EST_SQL.format(raw=_hll_raw_sql("zb.zp", "zb.np"), np="zb.np")}
                   AS e_b
        FROM zu
        JOIN zt za ON za.t = zu.ta
        JOIN zt zb ON zb.t = zu.tb
    ),
    users AS (SELECT DISTINCT t, user_id FROM ev),
    exact_union AS (
        SELECT p.ta, p.tb, COUNT(DISTINCT e.user_id) AS x_union
        FROM pairs p JOIN ev e ON e.t IN (p.ta, p.tb)
        GROUP BY p.ta, p.tb
    ),
    exact_inter AS (
        SELECT p.ta, p.tb, COUNT(*) AS x_inter
        FROM pairs p
        JOIN users a ON a.t = p.ta
        JOIN users b ON b.t = p.tb AND b.user_id = a.user_id
        GROUP BY p.ta, p.tb
    )
    SELECT est.ta AS type_a, est.tb AS type_b,
           CAST(ROUND(CAST(est.e_union AS DECIMAL(38,8)), 2) AS DOUBLE)
               AS est_union,
           CAST(xu.x_union AS BIGINT) AS exact_union,
           CAST(ROUND(CAST(est.e_a + est.e_b - est.e_union
                AS DECIMAL(38,8)), 2) AS DOUBLE) AS est_intersection,
           CAST(xi.x_inter AS BIGINT) AS exact_intersection
    FROM est
    JOIN exact_union xu ON xu.ta = est.ta AND xu.tb = est.tb
    JOIN exact_inter xi ON xi.ta = est.ta AND xi.tb = est.tb
    """,
    description="HLL set algebra for audience overlap: per-event-type "
    "register tables union by element-wise MAX (the only set operation "
    "sketches support natively) and inclusion-exclusion turns union "
    "estimates into an INTERSECTION estimate — |A and B| = |A| + |B| - "
    "|A or B| — without ever materializing either user set. The "
    "audience-overlap / reach-dedup primitive: at 100 TB the three "
    "audiences never co-shuffle; each type's 256-row register table is "
    "the entire interchange. Same integer-space estimation as "
    "sketch_hll_mergeable_daily_rollup (bit-identical across engines), "
    "exact counts carried alongside as ground truth.",
)
def sketch_hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    types = ["view", "click", "purchase"]
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    ev = events.filter(F.col("event_type").isin(types)).select(
        F.col("event_type").alias("t"), "user_id", h.alias("h")
    )
    regs = ev.groupBy(
        "t", (F.col("h") % 256).alias("reg")
    ).agg(
        F.max(
            F.when(
                F.expr("h div 256") > 0,
                F.lit(53) - F.length(F.bin(F.expr("h div 256"))),
            ).otherwise(53)
        ).alias("m")
    )
    pairs = spark.createDataFrame(
        [("click", "purchase"), ("click", "view"), ("purchase", "view")],
        "ta string, tb string",
    )
    uni = (
        pairs.join(
            regs,
            (F.col("t") == F.col("ta")) | (F.col("t") == F.col("tb")),
        )
        .groupBy("ta", "tb", "reg")
        .agg(F.max("m").alias("m"))
    )
    z_expr = F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("m")).cast("bigint"))
    zu = uni.groupBy("ta", "tb").agg(
        z_expr.alias("zp"), F.count(F.lit(1)).alias("np")
    )
    zt = regs.groupBy("t").agg(
        z_expr.alias("zp"), F.count(F.lit(1)).alias("np")
    )
    est = (
        zu.join(
            zt.select(
                F.col("t").alias("ta"),
                F.col("zp").alias("zp_a"),
                F.col("np").alias("np_a"),
            ),
            "ta",
        )
        .join(
            zt.select(
                F.col("t").alias("tb"),
                F.col("zp").alias("zp_b"),
                F.col("np").alias("np_b"),
            ),
            "tb",
        )
        .select(
            "ta",
            "tb",
            _hll_est_col(F.col("zp"), F.col("np")).alias("e_union"),
            _hll_est_col(F.col("zp_a"), F.col("np_a")).alias("e_a"),
            _hll_est_col(F.col("zp_b"), F.col("np_b")).alias("e_b"),
        )
    )
    users = ev.select("t", "user_id").distinct()
    ua = users.select(F.col("t").alias("ta"), F.col("user_id").alias("u"))
    ub = users.select(F.col("t").alias("tb"), F.col("user_id").alias("u"))
    exact_union = (
        pairs.join(ua, "ta")
        .unionByName(pairs.join(ub, "tb").select("ta", "tb", "u"))
        .groupBy("ta", "tb")
        .agg(F.countDistinct("u").alias("x_union"))
    )
    exact_inter = (
        pairs.join(ua, "ta")
        .join(ub.withColumnRenamed("u", "u2"), "tb")
        .filter(F.col("u") == F.col("u2"))
        .groupBy("ta", "tb")
        .agg(F.countDistinct("u").alias("x_inter"))
    )
    return (
        est.join(exact_union, ["ta", "tb"])
        .join(exact_inter, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            dround(F.col("e_union"), 2).alias("est_union"),
            F.col("x_union").cast("bigint").alias("exact_union"),
            dround(
                F.col("e_a") + F.col("e_b") - F.col("e_union"), 2
            ).alias("est_intersection"),
            F.col("x_inter").cast("bigint").alias("exact_intersection"),
        )
    )


@register(
    "sketch_hll_sliding_7day_users",
    oracle=f"""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
        FROM events
    ),
    daily AS (
        SELECT day, h % 256 AS reg,
               MAX(CASE WHEN h // 256 > 0
                        THEN 53 - length(bin(h // 256)) ELSE 53 END) AS m
        FROM ev GROUP BY day, reg
    ),
    days AS (SELECT DISTINCT day FROM daily),
    win AS (
        SELECT d.day, m.reg, MAX(m.m) AS m
        FROM days d JOIN daily m
          ON m.day <= d.day AND m.day >= d.day - INTERVAL 6 DAY
        GROUP BY d.day, m.reg
    ),
    z AS (
        SELECT day, SUM(CAST(POW(2.0, 53 - m) AS BIGINT)) AS zp,
               COUNT(*) AS np
        FROM win GROUP BY day
    ),
    exact AS (
        SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_users_7d
        FROM days d JOIN ev e
          ON e.day <= d.day AND e.day >= d.day - INTERVAL 6 DAY
        GROUP BY d.day
    )
    SELECT z.day,
           CAST(ROUND(CAST(
               {_HLL_EST_SQL.format(raw=_hll_raw_sql("z.zp", "z.np"), np="z.np")}
               AS DECIMAL(38,8)), 2) AS DOUBLE) AS est_users_7d,
           CAST(e.exact_users_7d AS BIGINT) AS exact_users_7d
    FROM z JOIN exact e ON e.day = z.day
    """,
    description="Sliding 7-day distinct users from HLL register state — "
    "the sketch twin of events_dau_wau's exact sliding window: each "
    "day's 256-register sketch is built once (one map-side-combinable "
    "groupBy over the facts), and ANY trailing window is answered by "
    "MAX-merging at most 7 register tables — O(days x 256) work "
    "regardless of fact volume, where the exact path must re-touch "
    "every event in the window. Completes the sketch-family ladder: "
    "point NDV (sketch_hll_distinct_users), cumulative rollup, set "
    "algebra (audience overlap), sliding window (this). Integer-space "
    "estimation, linear-counting corrected, exact count alongside.",
)
def sketch_hll_sliding_7day_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    ev = events.select(
        F.col("ts").cast("date").alias("day"), "user_id", h.alias("h")
    )
    daily = ev.groupBy(
        "day", (F.col("h") % 256).alias("reg")
    ).agg(
        F.max(
            F.when(
                F.expr("h div 256") > 0,
                F.lit(53) - F.length(F.bin(F.expr("h div 256"))),
            ).otherwise(53)
        ).alias("m")
    )
    days = daily.select("day").distinct()
    win = (
        days.alias("d")
        .join(
            daily.alias("m"),
            (F.col("m.day") <= F.col("d.day"))
            & (F.col("m.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("m.reg").alias("reg"))
        .agg(F.max("m.m").alias("m"))
    )
    z = win.groupBy("day").agg(
        F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("m")).cast("bigint")).alias(
            "zp"
        ),
        F.count(F.lit(1)).alias("np"),
    )
    exact = (
        days.alias("d")
        .join(
            ev.select("day", "user_id").distinct().alias("e"),
            (F.col("e.day") <= F.col("d.day"))
            & (F.col("e.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("e.user_id").alias("exact_users_7d"))
    )
    return (
        z.join(exact, "day")
        .select(
            "day",
            dround(_hll_est_col(F.col("zp"), F.col("np")), 2).alias(
                "est_users_7d"
            ),
            F.col("exact_users_7d").cast("bigint").alias("exact_users_7d"),
        )
    )


@register(
    "sketch_hll_exact_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
    FROM events
    GROUP BY event_type
    """,
    description="Oracle-checkable twin of sketch_hll_distinct_users: the "
    "exact per-type NDV the sketch approximates (countDistinct = "
    "expand+shuffle, affordable at this grain) — lets the sketch query "
    "stay rows-only without leaving its ground truth unverified.",
)
def sketch_hll_exact_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
    )


# ------------------------------------------------------------------ JSON
@register(
    "events_json_kpis",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(CAST(AVG(value) AS DECIMAL(38,8)), 4) AS DOUBLE)
               AS avg_value,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    description="Semi-structured ops: JSON field extraction from "
    "events.props + grouped KPIs.",
)
def events_json_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(F.avg("value"), 4).alias("avg_value"),
        F.sum(k).alias("sum_k"),
    )


# -------------------------------------------------------------- sessions
@register(
    "events_sessionization",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    )
    SELECT user_id,
           CAST(SUM(is_start) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM marked
    GROUP BY user_id
    """,
    description="Gap-based sessionization (30-min inactivity) via "
    "lag window + conditional sum; one shuffle on user_id.",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    is_start = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("long") - prev_ts.cast("long")) > 30 * 60),
        1,
    ).otherwise(0)
    return (
        events.select("user_id", "ts", is_start.alias("is_start"))
        .groupBy("user_id")
        .agg(
            F.sum("is_start").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ------------------------------------------------------------ as-of join
@register(
    "events_asof_purchase_before_error",
    oracle="""
    SELECT e.event_id AS error_event_id,
           e.user_id AS user_id,
           MAX(p.ts) AS last_purchase_ts
    FROM events e
    LEFT JOIN events p
      ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
    description="As-of join: for every error event, the most recent prior "
    "purchase by the same user. Spark plan is the scalable union+window "
    "last_value formulation (one shuffle, no O(n^2) range join); the "
    "oracle is the naive max-join.",
)
def events_asof_purchase_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # Union formulation: tag purchase timestamps, carry them forward with
    # last_value(ignorenulls) ordered by ts (purchases sort before errors on
    # ts ties so `<=` semantics hold), then keep error rows.
    tagged = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias(
            "tie_rank"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("tie_rank").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_purchase_ts", F.last("purchase_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_event_id"),
            "user_id",
            "last_purchase_ts",
        )
    )


# ------------------------------------------------------------- skew join
@register(
    "skew_salted_join_event_kpis",
    oracle="""
    WITH dim AS (
        SELECT event_type, AVG(value) AS type_avg
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(CAST(SUM(e.value - d.type_avg) AS DECIMAL(38,8)), 2)
                AS DOUBLE) AS sum_dev
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
    description="Skew-mitigated join: events (hot low-cardinality "
    "event_type key) joined to a per-type dim via deterministic 8-way "
    "salting — each hot key spreads over 8 reducers; result is provably "
    "identical to the unsalted join (the oracle runs it unsalted).",
)
def skew_salted_join_event_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_lakehouse_spark.functions.skew import salted_join
    from healthcare_data_lakehouse_spark.tables import table as _t

    events = _t(spark, sf_dir, "events")
    dim = events.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    joined = salted_join(
        events, dim, on="event_type", fact_unique_col="event_id", n_salts=8
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(F.sum(F.col("value") - F.col("type_avg")), 2).alias("sum_dev"),
    )


# ------------------------------------------------------------- range join
@register(
    "range_join_errors_after_purchase",
    oracle="""
    SELECT p.user_id,
           COUNT(*) AS n_pairs,
           MIN(date_diff('second', p.ts, e.ts)) AS min_gap_seconds
    FROM events p JOIN events e
      ON e.user_id = p.user_id
     AND p.event_type = 'purchase' AND e.event_type = 'error'
     AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY p.user_id
    """,
    description="Banded range join, bucket-partitioned: both sides bucket "
    "ts into band-width buckets and equi-join on (user, bucket) with the "
    "error side probing its own + previous bucket — candidate volume is "
    "O(events per adjacent bucket pair), never the O(n^2) nested loop a "
    "raw inequality join plans; exact band predicate filters after. The "
    "oracle runs the naive inequality join.",
)
def range_join_errors_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    band = 3600  # seconds
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / band).alias(
            "p_bucket"
        ),
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.floor(
                F.unix_timestamp(F.col("ts").cast("timestamp")) / band
            ).alias("e_bucket"),
        )
        # an error can match purchases in its own or the previous bucket
        .withColumn(
            "probe_bucket",
            F.explode(F.array(F.col("e_bucket"), F.col("e_bucket") - 1)),
        )
    )
    pairs = purchases.join(
        errors,
        (purchases.p_user == errors.e_user)
        & (purchases.p_bucket == errors.probe_bucket),
    ).filter(
        (F.col("e_ts") > F.col("p_ts"))
        & (
            F.unix_timestamp(F.col("e_ts").cast("timestamp"))
            - F.unix_timestamp(F.col("p_ts").cast("timestamp"))
            <= band
        )
    )
    return pairs.groupBy(F.col("p_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(
            F.unix_timestamp(F.col("e_ts").cast("timestamp"))
            - F.unix_timestamp(F.col("p_ts").cast("timestamp"))
        ).alias("min_gap_seconds"),
    )


# ----------------------------------------------------- set op: INTERSECT
@register(
    "setop_users_purchase_and_error",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    description="Set operation INTERSECT (distinct): users who both "
    "purchased and errored — compiles to a left-semi hash join over "
    "de-duplicated key sets; one shuffle per side on user_id.",
)
def setop_users_purchase_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select("user_id")
    e = events.filter(F.col("event_type") == "error").select("user_id")
    return p.intersect(e)


# ------------------------------------------------ deterministic sampling
@register(
    "sample_systematic_orders",
    oracle="""
    SELECT COUNT(*) AS n_sampled,
           ROUND(SUM(o_totalprice), 2) AS sampled_revenue,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'
    """,
    description="Systematic content-hash sampling: keep rows whose "
    "md5(key) first byte < 0x0d (~5.1%). Unlike TABLESAMPLE this is "
    "reproducible across engines, runs, and cluster sizes — the sample "
    "is a pure function of the data, so a 100 TB re-run or a DuckDB "
    "audit selects the identical row set. Fully pushed into the scan "
    "projection; no shuffle before the final scalar aggregate.",
)
def sample_systematic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "0d"
        )
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("o_totalprice"), 2).alias("sampled_revenue"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


# ------------------------------------------------------- funnel analysis
@register(
    "events_funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS step_view,
           (SELECT COUNT(*) FROM c) AS step_click,
           (SELECT COUNT(*) FROM p) AS step_purchase
    """,
    description="Ordered funnel: users who viewed, then clicked after "
    "first view, then purchased after first click. Each step is a "
    "per-user MIN aggregate semi-joined to the next event type with a "
    "time-order predicate — three shuffles all partitioned on user_id "
    "(one reusable exchange per step at scale), no window over raw "
    "events and no per-user collect.",
)
def events_funnel_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str, tcol: str, out: str) -> DataFrame:
        e = events.filter(F.col("event_type") == etype).select(
            F.col("user_id").alias("u"), "ts"
        )
        return (
            e.join(prev, (e.u == prev.user_id) & (e.ts > prev[tcol]))
            .groupBy(F.col("u").alias("user_id"))
            .agg(F.min("ts").alias(out))
        )

    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after(v, "click", "t1", "t2")
    p = first_after(c, "purchase", "t2", "t3")
    return (
        v.agg(F.count(F.lit(1)).alias("step_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("step_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("step_purchase")))
    )


# ------------------------------------------------- PSI drift detection --
@register(
    "quality_psi_value_drift",
    oracle="""
    WITH binned AS (
        SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref'
                    ELSE 'cur' END AS period,
               COUNT(*) AS n
        FROM events GROUP BY bin, period
    ),
    tot AS (SELECT period, SUM(n) AS t FROM binned GROUP BY period),
    props AS (
        SELECT b.bin,
               MAX(CASE WHEN b.period = 'ref'
                   THEN (b.n + 0.5) / (t.t + 0.5) END) AS p_ref,
               MAX(CASE WHEN b.period = 'cur'
                   THEN (b.n + 0.5) / (t.t + 0.5) END) AS p_cur
        FROM binned b JOIN tot t ON t.period = b.period
        GROUP BY b.bin
    )
    SELECT ROUND(SUM((COALESCE(p_cur, 0.0005) - COALESCE(p_ref, 0.0005))
                 * LN(COALESCE(p_cur, 0.0005) / COALESCE(p_ref, 0.0005))),
                 4) AS psi,
           COUNT(*) AS n_bins
    FROM props
    """,
    description="Population Stability Index between the first and "
    "second half-month of the value distribution — the standard "
    "feature-drift monitor for an ML data pipeline. Both periods bin "
    "in ONE pass (period is a CASE key, not two scans), proportions "
    "smooth additively, and the PSI reduction is a scalar aggregate — "
    "input-size-independent output.",
)
def quality_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    binned = events.groupBy(
        F.floor(F.col("value") / 50.0).alias("bin"),
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "ref"
        )
        .otherwise("cur")
        .alias("period"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = binned.groupBy("period").agg(F.sum("n").alias("t"))
    props = (
        binned.join(F.broadcast(tot), "period")
        .groupBy("bin")
        .agg(
            F.max(
                F.when(
                    F.col("period") == "ref",
                    (F.col("n") + 0.5) / (F.col("t") + 0.5),
                )
            ).alias("p_ref"),
            F.max(
                F.when(
                    F.col("period") == "cur",
                    (F.col("n") + 0.5) / (F.col("t") + 0.5),
                )
            ).alias("p_cur"),
        )
    )
    eps = F.lit(0.0005)
    p_ref = F.coalesce(F.col("p_ref"), eps)
    p_cur = F.coalesce(F.col("p_cur"), eps)
    return props.agg(
        F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 4).alias("psi"),
        F.count(F.lit(1)).alias("n_bins"),
    )


# ------------------------------------------------- RFM segmentation -----
@register(
    "rfm_customer_segments",
    oracle="""
    WITH mx AS (SELECT CAST(MAX(ts) AS DATE) AS md FROM events),
    rfm AS (
        SELECT user_id,
               date_diff('day', CAST(MAX(ts) AS DATE), mx.md) AS recency,
               COUNT(*) AS freq,
               ROUND(SUM(value), 2) AS monetary
        FROM events, mx
        WHERE event_type = 'purchase'
        GROUP BY user_id, mx.md
    )
    SELECT r_tile, f_tile, m_tile, COUNT(*) AS n_users
    FROM (
        SELECT NTILE(5) OVER (ORDER BY recency, user_id) AS r_tile,
               NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_tile,
               NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_tile
        FROM rfm
    ) GROUP BY r_tile, f_tile, m_tile
    """,
    description="RFM segmentation: recency/frequency/monetary quintiles "
    "per purchasing user, re-aggregated to segment sizes. All three "
    "NTILEs sort the user-grain aggregate (not raw events) with "
    "user_id tiebreaks for total determinism; the three windows share "
    "one global sort input at #users cardinality.",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    # snapshot date = max over ALL events (the analysis date), matching the
    # oracle — not the purchase-only max, which could lag it
    mx = events.agg(F.to_date(F.max("ts")).alias("md"))
    rfm = (
        purchases.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "md")
        .agg(
            F.datediff(F.col("md"), F.to_date(F.max("ts"))).alias("recency"),
            F.count(F.lit(1)).alias("freq"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    return (
        rfm.select(
            F.ntile(5)
            .over(Window.orderBy("recency", "user_id"))
            .alias("r_tile"),
            F.ntile(5)
            .over(Window.orderBy(F.col("freq").desc(), "user_id"))
            .alias("f_tile"),
            F.ntile(5)
            .over(Window.orderBy(F.col("monetary").desc(), "user_id"))
            .alias("m_tile"),
        )
        .groupBy("r_tile", "f_tile", "m_tile")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "sketch_approx_percentile_order_value",
    # Bounded-error oracle (VERDICT r10 ask #4): the KLL/GK-style estimate
    # is engine-specific, but its guarantee is a RANK bound — with
    # accuracy=10000 the returned element's rank is within n*1e-4 of the
    # target. The oracle computes the exact interpolated percentiles in
    # SQL; the Spark side asserts the sketch value lands inside the exact
    # [q-0.005, q+0.005] value band (50x the theoretical rank slack, to
    # absorb interpolation-vs-order-statistic discreteness). A drifting
    # estimate flips within_rank_band to FALSE and the hash compare fails.
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(ROUND(CAST(quantile_cont(o.o_totalprice, 0.5)
                AS DECIMAL(38,8)), 2) AS DOUBLE) AS p50_exact,
           CAST(ROUND(CAST(quantile_cont(o.o_totalprice, 0.95)
                AS DECIMAL(38,8)), 2) AS DOUBLE) AS p95_exact,
           COUNT(*) AS n_orders,
           TRUE AS within_rank_band
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    description="approx_percentile sketch per market segment (p50/p95, "
    "accuracy 10000): mergeable bounded-memory quantile state — the "
    "100 TB path where exact percentile's full sort per group is "
    "unaffordable. Bounded-error check: the sketch value must land "
    "between the exact interpolated percentiles at q-0.005 and q+0.005, "
    "asserted per group against the SQL-exact quantiles.",
)
def sketch_approx_percentile_order_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    def _band(q: float, eps: float = 0.005):
        approx = F.expr(f"approx_percentile(o_totalprice, {q}, 10000)")
        lo = F.expr(f"percentile(o_totalprice, {q - eps})")
        hi = F.expr(f"percentile(o_totalprice, {q + eps})")
        return (approx >= lo) & (approx <= hi)

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            dround(F.expr("percentile(o_totalprice, 0.5)"), 2).alias(
                "p50_exact"
            ),
            dround(F.expr("percentile(o_totalprice, 0.95)"), 2).alias(
                "p95_exact"
            ),
            F.count(F.lit(1)).alias("n_orders"),
            (_band(0.5) & _band(0.95)).alias("within_rank_band"),
        )
    )


# ----------------------------------------------- entity resolution
@register(
    "er_fuzzy_customer_match",
    oracle="""
    WITH variants AS (
        SELECT c_custkey + 1000000 AS variant_id,
               substr(c_name, 1, length(c_name) - 2)
                   || substr(c_name, length(c_name), 1)
                   || substr(c_name, length(c_name) - 1, 1) AS dirty_name
        FROM customer WHERE c_custkey % 10 = 3
    )
    SELECT variant_id, best_custkey, best_distance FROM (
        SELECT v.variant_id, c.c_custkey AS best_custkey,
               levenshtein(v.dirty_name, c.c_name) AS best_distance,
               ROW_NUMBER() OVER (
                   PARTITION BY v.variant_id
                   ORDER BY levenshtein(v.dirty_name, c.c_name), c.c_custkey) AS rn
        FROM variants v JOIN customer c
          ON substr(v.dirty_name, 1, 16) = substr(c.c_name, 1, 16)
        WHERE levenshtein(v.dirty_name, c.c_name) <= 2
    ) WHERE rn <= 1
    """,
    description="Blocked fuzzy entity resolution: dirty records (last "
    "two characters transposed — a deterministic typo model) matched "
    "back to the master by Levenshtein <= 2 WITHIN a 16-char-prefix "
    "block, best match by (distance, key). The block key turns an "
    "O(N^2) all-pairs edit-distance into an equi-join whose per-block "
    "fan-out is bounded (~100 rows/block), which is the only way "
    "edit-distance matching survives 100 TB; transpositions cost 2 "
    "(substitution pairs) under plain Levenshtein, hence the <= 2 "
    "cutoff. Note the deliberate hazard it surfaces: a digit "
    "transposition can land EXACTLY on another real customer "
    "(distance 0 false merge) — the query ranks it first, as any "
    "production ER would, making the collision auditable.",
)
def er_fuzzy_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    n = F.length("c_name")
    variants = cust.filter(F.col("c_custkey") % 10 == 3).select(
        (F.col("c_custkey") + 1_000_000).alias("variant_id"),
        F.concat(
            F.expr("substr(c_name, 1, length(c_name) - 2)"),
            F.expr("substr(c_name, length(c_name), 1)"),
            F.expr("substr(c_name, length(c_name) - 1, 1)"),
        ).alias("dirty_name"),
    )
    joined = variants.join(
        cust,
        F.expr("substr(dirty_name, 1, 16)") == F.expr("substr(c_name, 1, 16)"),
    ).select(
        "variant_id",
        F.col("c_custkey"),
        F.levenshtein("dirty_name", "c_name").alias("dist"),
    ).filter(F.col("dist") <= 2)
    w = Window.partitionBy("variant_id").orderBy("dist", "c_custkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1)
        .select(
            "variant_id",
            F.col("c_custkey").alias("best_custkey"),
            F.col("dist").alias("best_distance"),
        )
    )


# ------------------------------------------- market-basket analysis
@register(
    "assoc_part_pairs_lift",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets),
    item AS (
        SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY l_partkey
        HAVING COUNT(*) >= 20
    ),
    freq AS (
        SELECT b.l_orderkey, b.l_partkey FROM baskets b
        JOIN item i ON i.l_partkey = b.l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_co
        FROM freq a JOIN freq b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, n_co,
           ROUND(CAST(p.n_co AS DOUBLE) / ia.n_item, 6) AS confidence,
           ROUND(CAST(p.n_co AS DOUBLE) * n_orders.n / (ia.n_item * ib.n_item), 6)
               AS lift
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n_orders
    """,
    description="Market-basket association rules over order baskets: "
    "co-occurrence pairs with confidence and lift. The A-priori "
    "anti-monotonicity prefilter (items below min-support can never "
    "form a frequent pair) shrinks the basket table BEFORE the "
    "positional self-join — at 100 TB this is the difference between "
    "a bounded pair space and a quadratic blow-up; the join shuffles "
    "on orderkey so each basket's pairs form locally.",
)
def assoc_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # r14 (guide §2.4): per-order posting fold replaces the distinct +
    # basket self-join — ONE order-keyed exchange builds the sorted
    # per-order part set; item supports, the order count, and the
    # in-group pair counts all derive from it. The both-parts-frequent
    # condition moves AFTER counting (inner joins against the frequent-
    # item table below), which leaves every pair's co-order count
    # unchanged — frequency filtering never changed n_co, only which
    # pairs are reported.
    grouped = li.select("l_orderkey", "l_partkey").groupBy(
        "l_orderkey"
    ).agg(F.collect_set("l_partkey").alias("xs"))
    n_orders_df = grouped.agg(
        F.count(F.lit(1)).alias("n_orders_total")
    )
    item = (
        grouped.select(F.explode("xs").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .filter(F.col("n_item") >= 20)
    )
    pairs = (
        grouped.select(
            F.expr(
                "explode(flatten(transform(xs, x -> "
                "transform(filter(xs, y -> y > x), "
                "y -> struct(x AS part_a, y AS part_b)))))"
            ).alias("pr")
        )
        .groupBy(F.col("pr.part_a").alias("part_a"),
                 F.col("pr.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .join(F.broadcast(n_orders_df))
        .select(
            "part_a",
            "part_b",
            "n_co",
            F.round(F.col("n_co").cast("double") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("n_co").cast("double")
                * F.col("n_orders_total")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------- FULL OUTER alignment
@register(
    "fullouter_daily_orders_vs_events",
    oracle="""
    WITH o AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    ),
    e AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT COALESCE(o.day, e.day) AS day,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.revenue, 0.0) AS revenue,
           COALESCE(e.n_events, 0) AS n_events
    FROM o FULL OUTER JOIN e ON e.day = o.day
    """,
    description="FULL OUTER day-grain alignment of two independently "
    "aggregated facts (order revenue vs event volume): days present in "
    "either side survive with zero-fill — the reconciliation join shape "
    "for cross-system audit. Both inputs aggregate to day grain BEFORE "
    "the join, so the outer join moves day-count rows, not fact rows.",
)
def fullouter_daily_orders_vs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    events = table(spark, sf_dir, "events")
    o = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    e = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        o.withColumnRenamed("day", "o_day")
        .join(e, F.col("o_day") == e.day, "full_outer")
        .select(
            F.coalesce(F.col("o_day"), F.col("day")).alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


# -------------------------------------------- bipartite co-supply graph
@register(
    "graph_supplier_copart_pairs",
    oracle="""
    WITH sp AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    pairs AS (
        SELECT a.s AS supp_a, b.s AS supp_b, COUNT(*) AS shared_parts
        FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        GROUP BY a.s, b.s
    )
    SELECT supp_a, supp_b, shared_parts
    FROM pairs
    ORDER BY shared_parts DESC, supp_a, supp_b LIMIT 25
    """,
    description="Bipartite-projection co-occurrence graph: suppliers "
    "linked by the parts they both ship (the supplier-side projection "
    "of the supplier-part bipartite graph), strongest 25 edges with "
    "total-order tiebreaks (TakeOrdered — per-partition top-k + merge, "
    "no global sort). Hybrid pair generation keyed on the SHARED "
    "entity (part), so candidate volume is the sum of per-part squared "
    "supplier counts — bounded by the fan-out of the densest part, "
    "never |suppliers|^2. COLD parts (supplier set under a threshold) "
    "expand combinations entirely inside codegen: one groupBy(part) "
    "collect_set, then a flatten(transform(...)) higher-order "
    "expression emits each sorted pair exactly once — zero join, zero "
    "replication. The tiny grouped table is explicitly repartitioned "
    "before the explode: AQE coalesces a 20k-row aggregate to 1-2 "
    "partitions, which would serialize the 400x pair amplification "
    "onto 2 threads (measured 2.5x slowdown at sf0.1) — the classic "
    "small-input/explosive-output AQE trap. HOT parts would "
    "concentrate an n^2 array in one task, so they take the salted "
    "self-join path instead, like hot LSH buckets: the right side "
    "buckets suppliers into 8 salts (hash(s) mod 8), the left side "
    "replicates across all 8, and the join keys on (part, salt), "
    "spreading each hot part's quadratic pair generation over 8 "
    "reducers while cold parts pay ZERO replication. Every pair still "
    "appears exactly once (a supplier owns one salt; cold/hot parts "
    "are disjoint). The same plan builds user-cooccurrence, "
    "doc-citation, and basket-affinity graphs.",
)
def graph_supplier_copart_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salts = 8
    hot_threshold = 64
    li = table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    # one shuffle: per-part sorted supplier set; repartition defeats the
    # AQE coalesce that would otherwise serialize the explode below
    grouped = (
        sp.groupBy("p")
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
        .repartition(64)
        .localCheckpoint()
    )
    cold_pairs = (
        grouped.filter(F.size("ss") < hot_threshold)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS supp_a, y AS supp_b))))"
                )
            ).alias("pr")
        )
        .select("pr.supp_a", "pr.supp_b")
    )
    # hot parts: back to (p, s) rows (linear, never n^2) and salted join
    hot_sp = grouped.filter(F.size("ss") >= hot_threshold).select(
        "p", F.explode("ss").alias("s")
    )
    a = hot_sp.withColumn(
        "r", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    ).alias("a")
    b = hot_sp.withColumn(
        "r", F.pmod(F.hash("s"), F.lit(n_salts))
    ).alias("b")
    hot_pairs = a.join(
        b,
        (F.col("a.p") == F.col("b.p"))
        & (F.col("a.r") == F.col("b.r"))
        & (F.col("a.s") < F.col("b.s")),
    ).select(F.col("a.s").alias("supp_a"), F.col("b.s").alias("supp_b"))
    return (
        cold_pairs.unionByName(hot_pairs)
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
        .orderBy(F.desc("shared_parts"), "supp_a", "supp_b")
        .limit(25)
    )


# ------------------------------------------------- LOCF daily gap fill
@register(
    "events_locf_daily_user_value",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               ROUND(AVG(value), 4) AS day_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
        GROUP BY user_id
    ),
    spine AS (
        SELECT s.user_id, CAST(u.d AS DATE) AS day
        FROM spans s, UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY))
             AS u(d)
    )
    SELECT sp.user_id, sp.day,
           LAST_VALUE(d.day_value IGNORE NULLS) OVER (
               PARTITION BY sp.user_id ORDER BY sp.day
               ROWS UNBOUNDED PRECEDING) AS locf_value,
           (d.day_value IS NULL) AS is_filled
    FROM spine sp LEFT JOIN daily d
      ON d.user_id = sp.user_id AND d.day = sp.day
    """,
    description="Last-observation-carried-forward densification: each "
    "user's purchase-value series is expanded to a contiguous daily "
    "spine (sequence+explode, bounded by the user's own active span) "
    "and gaps inherit the most recent real observation via last(value) "
    "IGNORE NULLS over a user-partitioned running frame — the standard "
    "panel-data imputation (sensor readings, account balances, feature "
    "staleness). Completes the densification trio: zero-fill "
    "(calendar_daily_event_gapfill), as-of join (events_asof...), LOCF "
    "(this). Spine explode is per-user-bounded; the window never "
    "crosses users, so no global sort exists anywhere.",
)
def events_locf_daily_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.avg("value"), 4).alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
            F.col("day_value").isNull().alias("is_filled"),
        )
    )


# ------------------------------------------- forecast: Holt linear trend
@register(
    "forecast_holt_monthly_revenue",
    oracle="""
    WITH RECURSIVE monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ) AS rn
        FROM orders GROUP BY 1
    ),
    holt AS (
        SELECT rn, month, rev,
               CAST(rev AS DOUBLE) AS l,
               CAST(0 AS DOUBLE) AS b,
               CAST(NULL AS DOUBLE) AS f
        FROM monthly WHERE rn = 1
        UNION ALL
        SELECT m.rn, m.month, m.rev,
               0.5 * m.rev + 0.5 * (h.l + h.b),
               0.25 * ((0.5 * m.rev + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b,
               h.l + h.b
        FROM holt h JOIN monthly m ON m.rn = h.rn + 1
    )
    SELECT month, rev,
           ROUND(l, 4) AS level,
           ROUND(b, 4) AS trend,
           ROUND(f, 4) AS fitted
    FROM holt
    """,
    description="Holt double-exponential smoothing (level+trend) over "
    "monthly order revenue: alpha=0.5, beta=0.25 (binary-exact constants), "
    "seed l1=y1/b1=0, fitted = one-step-ahead l+b. One agg shuffle "
    "collapses 100 TB to a #months-row series; the linear recurrence then "
    "runs as a single sequential F.aggregate fold over the sorted array — "
    "post-aggregation metadata scale, the same trick a recursive CTE plays "
    "in the oracle. No Python, no extra shuffle.",
)
def forecast_holt_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    series = monthly.agg(
        F.sort_array(F.collect_list(F.struct("month", "rev"))).alias("s")
    )

    alpha, beta = 0.5, 0.25

    def step(acc, x):
        first = acc["i"] == 0
        fitted = acc["l"] + acc["b"]
        new_l = F.when(first, x["rev"].cast("double")).otherwise(
            alpha * x["rev"] + (1 - alpha) * fitted
        )
        new_b = F.when(first, F.lit(0.0)).otherwise(
            beta * (new_l - acc["l"]) + (1 - beta) * acc["b"]
        )
        row = F.struct(
            x["month"].alias("month"),
            x["rev"].alias("rev"),
            F.round(new_l, 4).alias("level"),
            F.round(new_b, 4).alias("trend"),
            F.when(first, F.lit(None).cast("double"))
            .otherwise(F.round(fitted, 4))
            .alias("fitted"),
        )
        return F.struct(
            F.concat(acc["rows"], F.array(row)).alias("rows"),
            new_l.alias("l"),
            new_b.alias("b"),
            (acc["i"] + 1).alias("i"),
        )

    init = F.struct(
        F.array().cast(
            "array<struct<month:date,rev:double,level:double,"
            "trend:double,fitted:double>>"
        ).alias("rows"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0).alias("i"),
    )
    folded = series.select(
        F.aggregate(F.col("s"), init, step)["rows"].alias("rows")
    )
    return folded.select(F.explode("rows").alias("r")).select(
        "r.month", "r.rev", "r.level", "r.trend", "r.fitted"
    )


# ------------------------------------- STL-style seasonal decomposition
@register(
    "forecast_stl_decompose_monthly",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT month, rev,
               {dround_sql("AVG(rev) OVER (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)", 4)} AS trend
        FROM monthly
    ),
    d AS (SELECT month, rev, trend, rev - trend AS detr FROM t),
    s AS (
        SELECT month, rev, trend, detr,
               {dround_sql("AVG(detr) OVER (PARTITION BY month(month))", 4)} AS seasonal
        FROM d
    )
    SELECT month, rev, trend, seasonal,
           {dround_sql("detr - seasonal", 4)} AS residual
    FROM s
    """,
    description="Additive STL-style decomposition of monthly order revenue: "
    "trend = centered 13-month moving average, seasonal = month-of-year "
    "mean of the detrended series, residual = remainder. One agg shuffle "
    "collapses the fact table to a #months-row series; every window after "
    "that is post-aggregation metadata scale.",
)
def forecast_stl_decompose_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    w13 = Window.orderBy("month").rowsBetween(-6, 6)
    t = monthly.withColumn("trend", dround(F.avg("rev").over(w13), 4))
    d = t.withColumn("detr", F.col("rev") - F.col("trend"))
    s = d.withColumn(
        "seasonal",
        dround(F.avg("detr").over(Window.partitionBy(F.month("month"))), 4),
    )
    return s.select(
        "month",
        "rev",
        "trend",
        "seasonal",
        dround(F.col("detr") - F.col("seasonal"), 4).alias("residual"),
    )


# ------------------------------------- Markov chain stationary distribution
_MARKOV_ITERS = 30

def _markov_oracle() -> str:
    # Every CTE is MATERIALIZED: DuckDB inlines single-reference CTEs, and
    # a 30-deep inlined join/agg chain sends its optimizer superlinear
    # (30 un-materialized steps never returned; materialized: 0.07s).
    head = """
    WITH seq AS MATERIALIZED (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS prev_type
        FROM events
    ),
    counts AS MATERIALIZED (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS c
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    states AS MATERIALIZED (SELECT DISTINCT prev_type AS state FROM counts),
    mat AS MATERIALIZED (
        SELECT prev_type, next_type,
               CAST(c AS DOUBLE)
                   / SUM(CAST(c AS DOUBLE)) OVER (PARTITION BY prev_type)
                   AS prob
        FROM counts
        WHERE next_type IN (SELECT state FROM states)
    ),
    v0 AS (
        SELECT state, 1.0 / (SELECT COUNT(*) FROM states) AS v FROM states
    )"""
    steps = ",\n".join(
        f"""    v{k + 1} AS MATERIALIZED (
        SELECT m.next_type AS state, SUM(v.v * m.prob) AS v
        FROM v{k} v JOIN mat m ON v.state = m.prev_type
        GROUP BY 1
    )"""
        for k in range(_MARKOV_ITERS)
    )
    from healthcare_data_lakehouse_spark.functions import dround_sql as _ds

    return (
        head
        + ",\n"
        + steps
        + f"""
    SELECT state, {_ds("v", 6)} AS stationary FROM v{_MARKOV_ITERS}
    """
    )


@register(
    "events_markov_stationary",
    oracle=_markov_oracle(),
    description="Stationary distribution of the per-user event-type Markov "
    "chain: transition counting is the distributed part (one lag window + "
    "one groupBy over 100 TB of events); the row-stochastic matrix is "
    "|event_types|^2 — metadata scale — so the power iteration (30 steps, "
    "matching the oracle's unrolled CTE chain) runs driver-side in numpy, "
    "exactly like IVF centroids. Columns restricted to observed source "
    "states and rows renormalized so the chain stays stochastic.",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # |event_types|^2 rows: metadata scale by construction
    )
    states = sorted({r.prev_type for r in counts})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    mat = np.zeros((n, n))
    for r in counts:
        if r.next_type in idx:
            mat[idx[r.prev_type], idx[r.next_type]] = r.c
    mat = mat / mat.sum(axis=1, keepdims=True)
    v = np.full(n, 1.0 / n)
    for _ in range(_MARKOV_ITERS):
        v = v @ mat
    out = spark.createDataFrame(
        [(s, float(v[idx[s]])) for s in states], ["state", "stationary"]
    )
    return out.select("state", dround("stationary", 6).alias("stationary"))


# ------------------------------------- daily open-order backlog sweepline
@register(
    "orders_open_backlog_daily",
    oracle="""
    WITH span AS (
        SELECT o_orderkey, d0, greatest(d1, d0) AS d1
        FROM (
            SELECT o_orderkey,
                   CAST(o_orderdate AS DATE) AS d0,
                   CAST(MAX(l_shipdate) AS DATE) AS d1
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        )
    ),
    deltas AS (
        SELECT d0 AS day, 1 AS delta FROM span
        UNION ALL
        SELECT CAST(d1 + INTERVAL 1 DAY AS DATE), -1 FROM span
    ),
    daily AS (
        SELECT day, CAST(SUM(delta) AS BIGINT) AS net
        FROM deltas GROUP BY 1
    )
    SELECT day, net,
           CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM daily
    """,
    description="Daily open-order backlog via interval sweepline: each "
    "order contributes +1 at orderdate and -1 the day after its last "
    "shipment; a groupBy collapses 100 TB of deltas to a #days-row series "
    "and the prefix sum runs at day grain. Never expands intervals into "
    "per-day rows per order (the naive range-explode is O(rows x days)).",
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d0"))
        .agg(F.to_date(F.max("l_shipdate")).alias("d1"))
        # clamp inverted synthetic spans so the -1 can never precede the
        # +1 and the prefix sum stays a true backlog (>= 0 invariant)
        .select("o_orderkey", "d0", F.greatest("d1", "d0").alias("d1"))
    )
    deltas = span.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionAll(
        span.select(F.date_add("d1", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "net", F.sum("net").over(wcum).cast("bigint").alias("open_orders")
    )


# ------------------------------------------- ABC inventory classification
@register(
    "orders_abc_classification",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, revenue,
               SUM(revenue) OVER (
                   ORDER BY revenue DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / SUM(revenue) OVER () AS cum_share
        FROM rev
    ),
    classed AS (
        SELECT l_partkey, revenue,
               {dround_sql("cum_share", 6)} AS cum_share,
               CASE WHEN cum_share <= 0.8 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(revenue), 2) AS class_revenue,
           {dround_sql("CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER ()", 6)} AS part_share
    FROM classed GROUP BY abc_class
    """,
    description="ABC (Pareto) inventory classification: parts ranked by "
    "revenue, cumulative-share cut at 80/95%, rolled up to class KPIs. "
    "One part-grain agg, then rank/prefix windows over that aggregate; at "
    "1e9+ parts the prefix sum switches to the partition-offset scheme "
    "(see pipeline_global_row_index) with identical results.",
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )
    wcum = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "revenue",
        (F.sum("revenue").over(wcum) / F.sum("revenue").over(wall)).alias(
            "cum_share_raw"
        ),
    )
    classed = ranked.select(
        "revenue",
        F.when(F.col("cum_share_raw") <= 0.8, "A")
        .when(F.col("cum_share_raw") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    wall2 = Window.partitionBy()
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_revenue",
            dround(
                F.col("n_parts").cast("double")
                / F.sum("n_parts").over(wall2),
                6,
            ).alias("part_share"),
        )
    )


# ------------------------------------------- Wald-Wolfowitz runs test
@register(
    "stats_runs_test_randomness",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    ),
    med AS (
        SELECT quantile_cont(rev, 0.5) AS m FROM daily
    ),
    signs AS (
        SELECT day, CASE WHEN rev > m THEN 1 ELSE 0 END AS above
        FROM daily, med WHERE rev <> m
    ),
    runs AS (
        SELECT above,
               CASE WHEN LAG(above) OVER (ORDER BY day) IS DISTINCT FROM above
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    agg AS (
        SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
               CAST(SUM(above) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(above) AS BIGINT) AS n_neg
        FROM runs
    )
    SELECT n_runs, n_pos, n_neg,
           {dround_sql("1.0 + 2.0 * n_pos * n_neg / (n_pos + n_neg)", 4)} AS expected_runs,
           {dround_sql("(n_runs - (1.0 + 2.0 * n_pos * n_neg / (n_pos + n_neg))) / sqrt( (2.0 * n_pos * n_neg * (2.0 * n_pos * n_neg - n_pos - n_neg)) / ((n_pos + n_neg) * (n_pos + n_neg) * (n_pos + n_neg - 1.0)) )", 4)} AS z
    FROM agg
    """,
    description="Wald-Wolfowitz runs test for randomness of daily revenue "
    "around its median: run counting via a lag window over the day-grain "
    "series, exact median from quantile_cont on the aggregate, normal "
    "approximation z. The whole ordered part runs post-aggregation at "
    "#days grain.",
)
def stats_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    med = daily.agg(
        F.expr("percentile(rev, 0.5)").alias("m")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select("day", (F.col("rev") > F.col("m")).cast("int").alias("above"))
    )
    wl = Window.orderBy("day")
    runs = signs.select(
        "above",
        F.when(
            ~F.lag("above").over(wl).eqNullSafe(F.col("above")), 1
        ).otherwise(0).alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("bigint").alias("n_runs"),
        F.sum("above").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("above")).cast("bigint").alias("n_neg"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    exp_runs = 1.0 + 2.0 * np_ * nn / (np_ + nn)
    var_runs = (2.0 * np_ * nn * (2.0 * np_ * nn - np_ - nn)) / (
        (np_ + nn) * (np_ + nn) * (np_ + nn - 1.0)
    )
    return agg.select(
        "n_runs",
        "n_pos",
        "n_neg",
        dround(exp_runs, 4).alias("expected_runs"),
        dround((F.col("n_runs") - exp_runs) / F.sqrt(var_runs), 4).alias("z"),
    )


# ------------------------------------------- Fano-factor burstiness
@register(
    "events_burstiness_fano",
    oracle=f"""
    WITH per_min AS (
        SELECT event_type, date_trunc('minute', ts) AS minute,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_minutes,
           {dround_sql("AVG(CAST(n AS DOUBLE))", 6)} AS mean_per_min,
           {dround_sql("var_samp(CAST(n AS DOUBLE))", 6)} AS var_per_min,
           {dround_sql("var_samp(CAST(n AS DOUBLE)) / AVG(CAST(n AS DOUBLE))", 6)} AS fano,
           CAST(CASE WHEN var_samp(CAST(n AS DOUBLE))
                          / AVG(CAST(n AS DOUBLE)) > 1.0
                THEN 1 ELSE 0 END AS INT) AS bursty
    FROM per_min GROUP BY event_type
    """,
    description="Fano-factor burstiness per event type: variance/mean of "
    "per-minute arrival counts (1 = Poisson, >1 = bursty). Two hash aggs "
    "(minute grain then type grain), both map-side combinable — the "
    "standard traffic-shape screen before rate-limiting or bot review. "
    "Note: only observed (type, minute) cells enter the count table, so "
    "the factor conditions on activity — the conservative direction for "
    "burst screening.",
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count("*").cast("bigint").alias("n"))
    nd = F.col("n").cast("double")
    return per_min.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_minutes"),
        dround(F.avg(nd), 6).alias("mean_per_min"),
        dround(F.var_samp(nd), 6).alias("var_per_min"),
        dround(F.var_samp(nd) / F.avg(nd), 6).alias("fano"),
        F.when(F.var_samp(nd) / F.avg(nd) > 1.0, 1)
        .otherwise(0)
        .cast("int")
        .alias("bursty"),
    )


# ------------------------------------- Holt-Winters triple smoothing
@register(
    "forecast_holt_winters_monthly",
    oracle="""
    WITH RECURSIVE monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ) AS rn
        FROM orders GROUP BY 1
    ),
    hw AS (
        SELECT 12 AS rn,
               (SELECT AVG(rev) FROM monthly WHERE rn <= 12) AS l,
               CAST(0 AS DOUBLE) AS b,
               (SELECT list(rev - (SELECT AVG(rev) FROM monthly WHERE rn <= 12)
                            ORDER BY rn)
                FROM monthly WHERE rn <= 12) AS s,
               CAST(NULL AS DOUBLE) AS shead,
               CAST(NULL AS DOUBLE) AS fitted
        UNION ALL
        SELECT m.rn,
               0.5 * (m.rev - h.s[1]) + 0.5 * (h.l + h.b),
               0.25 * ((0.5 * (m.rev - h.s[1]) + 0.5 * (h.l + h.b)) - h.l)
                   + 0.75 * h.b,
               list_append(
                   h.s[2:12],
                   0.25 * (m.rev - (0.5 * (m.rev - h.s[1])
                                    + 0.5 * (h.l + h.b)))
                       + 0.75 * h.s[1]
               ),
               h.s[1],
               h.l + h.b + h.s[1]
        FROM hw h JOIN monthly m ON m.rn = h.rn + 1
    )
    SELECT m.month, m.rev,
           ROUND(h.l, 4) AS level,
           ROUND(h.b, 4) AS trend,
           ROUND(h.shead, 4) AS seasonal,
           ROUND(h.fitted, 4) AS fitted
    FROM hw h JOIN monthly m ON m.rn = h.rn
    WHERE h.rn >= 13
    """,
    description="Holt-Winters additive triple exponential smoothing "
    "(alpha=0.5, beta=0.25, gamma=0.25, season m=12) over monthly order "
    "revenue: first-season init (l = season mean, b = 0, s_i = y_i - l), "
    "then level/trend/seasonal recurrence with one-step-ahead fitted "
    "values. Like the Holt query, the 100 TB input collapses to a "
    "#months series in one agg shuffle and the recurrence runs as a "
    "single sequential F.aggregate fold whose accumulator carries the "
    "rolling 12-slot seasonal array — the same state the oracle's "
    "recursive CTE threads through a LIST column.",
)
def forecast_holt_winters_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    series = monthly.agg(
        F.sort_array(F.collect_list(F.struct("month", "rev"))).alias("s")
    )

    alpha, beta, gamma = 0.5, 0.25, 0.25
    m = 12

    def step(acc, x):
        i = acc["i"]
        warm = F.when(
            i < m, F.concat(acc["warm"], F.array(x["rev"].cast("double")))
        ).otherwise(acc["warm"])
        # season-complete boundary: initialize l from the warm mean, b=0,
        # s_i = y_i - l (runs once, when the 12th month lands)
        warm_mean = (
            F.aggregate(warm, F.lit(0.0), lambda a, v: a + v) / m
        )
        init_now = i == (m - 1)
        l0 = F.when(init_now, warm_mean).otherwise(acc["l"])
        s0 = F.when(
            init_now, F.transform(warm, lambda v: v - warm_mean)
        ).otherwise(acc["s"])
        b0 = F.when(init_now, F.lit(0.0)).otherwise(acc["b"])

        shead = F.element_at(s0, 1)
        fitted = l0 + b0 + shead
        new_l = alpha * (x["rev"] - shead) + (1 - alpha) * (l0 + b0)
        new_b = beta * (new_l - l0) + (1 - beta) * b0
        s_new = F.concat(
            F.slice(s0, 2, m - 1),
            F.array(gamma * (x["rev"] - new_l) + (1 - gamma) * shead),
        )
        row = F.struct(
            x["month"].alias("month"),
            x["rev"].alias("rev"),
            F.round(new_l, 4).alias("level"),
            F.round(new_b, 4).alias("trend"),
            F.round(shead, 4).alias("seasonal"),
            F.round(fitted, 4).alias("fitted"),
        )
        active = i >= m  # months 13+ produce output rows
        return F.struct(
            F.when(active, F.concat(acc["rows"], F.array(row)))
            .otherwise(acc["rows"])
            .alias("rows"),
            F.when(active, new_l).otherwise(l0).alias("l"),
            F.when(active, new_b).otherwise(b0).alias("b"),
            F.when(active, s_new).otherwise(s0).alias("s"),
            warm.alias("warm"),
            (i + 1).alias("i"),
        )

    init = F.struct(
        F.array()
        .cast(
            "array<struct<month:date,rev:double,level:double,trend:double,"
            "seasonal:double,fitted:double>>"
        )
        .alias("rows"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.array().cast("array<double>").alias("s"),
        F.array().cast("array<double>").alias("warm"),
        F.lit(0).alias("i"),
    )
    folded = series.select(
        F.aggregate(F.col("s"), init, step)["rows"].alias("rows")
    )
    return folded.select(F.explode("rows").alias("r")).select(
        "r.month", "r.rev", "r.level", "r.trend", "r.seasonal", "r.fitted"
    )


# ------------------------------------------- k-core decomposition
_KCORE_K = 2
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    # MATERIALIZED per round: DuckDB inlines single-reference CTEs and a
    # deep join/agg chain sends the optimizer superlinear (same lesson as
    # events_markov_stationary).
    head = """
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    )"""
    steps = []
    for r in range(_KCORE_ROUNDS):
        steps.append(f"""    d{r} AS MATERIALIZED (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}
        ) GROUP BY node
    ),
    keep{r} AS MATERIALIZED (
        SELECT node FROM d{r} WHERE deg >= {_KCORE_K}
    ),
    e{r + 1} AS MATERIALIZED (
        SELECT u, v FROM e{r}
        WHERE u IN (SELECT node FROM keep{r})
          AND v IN (SELECT node FROM keep{r})
    )""")
    last = _KCORE_ROUNDS
    return (
        head + ",\n" + ",\n".join(steps) + f"""
    SELECT CAST(COUNT(DISTINCT node) AS BIGINT) AS core_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e{last}) AS core_edges,
           (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM d0)
               AS total_nodes
    FROM (SELECT u AS node FROM e{last} UNION ALL SELECT v FROM e{last})
    """
    )


@register(
    "graph_kcore_supplier_coorder",
    oracle=_kcore_oracle(),
    description="2-core of the supplier co-order graph (suppliers linked "
    "when they serve the same order) by iterative peeling: each of the 6 "
    "unrolled rounds drops nodes below degree 2 and their incident edges. "
    "Each round is one degree agg + one semi-join filter — key-partitioned "
    "shuffles only; rounds are unrolled into the plan exactly like the "
    "oracle's MATERIALIZED CTE chain, and 6 rounds is past the fixpoint "
    "at every test SF (peeling converges geometrically).",
)
def graph_kcore_supplier_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_lakehouse_spark.functions import skew as SK

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # r14 (guide §2.4): co-order edges via one per-order posting fold +
    # bounded in-group pair explode instead of the lineitem self-join
    # (orders hold few suppliers; the old join exchanged lineitem twice).
    edges = SK.co_occurrence_pairs(
        li, "l_orderkey", "l_suppkey"
    ).localCheckpoint()
    # r14 (guide §1/§5, jobs-per-query audit): one exploded aggregate
    # yields total_nodes AND the edge count — each edge contributes
    # exactly two node rows, so edges = rows/2 (previously two separate
    # distinct+count jobs per readout, 13 jobs for the query; now 8).
    first = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .agg(
            F.countDistinct("node").alias("n_nodes"),
            (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
        )
        .first()
    )
    total_nodes, prev_edges = first["n_nodes"], first["n_edges"]
    core_nodes = total_nodes
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        stats = (
            edges.select(F.explode(F.array("u", "v")).alias("node"))
            .agg(
                F.countDistinct("node").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
            )
            .first()
        )
        core_nodes, n_edges = stats["n_nodes"], stats["n_edges"]
        if n_edges == prev_edges:
            break  # peeling fixpoint: further rounds are no-ops, so the
            # early exit is result-identical to the oracle's fixed 6
        prev_edges = n_edges
    core_edges = n_edges
    return spark.createDataFrame(
        [(core_nodes, core_edges, total_nodes)],
        "core_nodes bigint, core_edges bigint, total_nodes bigint",
    )


# ------------------------------------------- Little's law validation
@register(
    "orders_littles_law_check",
    oracle=f"""
    WITH span AS (
        SELECT o_orderkey, d0, greatest(d1, d0) AS d1
        FROM (
            SELECT o_orderkey,
                   CAST(o_orderdate AS DATE) AS d0,
                   CAST(MAX(l_shipdate) AS DATE) AS d1
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        )
    ),
    horizon AS (
        SELECT CAST(MIN(d0) AS DATE) AS t0, CAST(MAX(d1) AS DATE) AS t1,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               AVG(CAST(d1 - d0 AS DOUBLE) + 1) AS w_days
        FROM span
    )
    SELECT n_orders,
           {dround_sql("w_days", 6)} AS avg_wait_days,
           {dround_sql("CAST(n_orders AS DOUBLE) / (CAST(t1 - t0 AS DOUBLE) + 1)", 6)} AS arrival_rate_per_day,
           {dround_sql("CAST(n_orders AS DOUBLE) / (CAST(t1 - t0 AS DOUBLE) + 1) * w_days", 6)} AS littles_L,
           {dround_sql("(SELECT AVG(CAST(cnt AS DOUBLE)) FROM (SELECT d, COUNT(*) AS cnt FROM span, UNNEST(range(CAST(d0 AS DATE), CAST(d1 + INTERVAL 1 DAY AS DATE), INTERVAL 1 DAY)) AS u(d) GROUP BY d))", 6)} AS observed_L
    FROM horizon
    """,
    description="Little's law sanity check on the order pipeline: "
    "L = lambda x W computed from arrival rate and average order lifetime "
    "vs the directly observed mean number of open orders. The observed "
    "side range-explodes intervals to days — bounded: #days per order, "
    "never order x order — while the closed-form side is one aggregate. "
    "Agreement (up to edge effects) validates the backlog sweepline.",
)
def orders_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d0"))
        .agg(F.to_date(F.max("l_shipdate")).alias("d1"))
        # synthetic data can ship before the order date; clamp so every
        # order has a >=1-day lifetime (both engines identically)
        .select("o_orderkey", "d0", F.greatest("d1", "d0").alias("d1"))
    )
    horizon = span.agg(
        F.min("d0").alias("t0"),
        F.max("d1").alias("t1"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.avg(F.datediff("d1", "d0").cast("double") + 1).alias("w_days"),
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    observed = days.groupBy("d").count().agg(
        F.avg(F.col("count").cast("double")).alias("obs_l")
    )
    lam = F.col("n_orders").cast("double") / (
        F.datediff("t1", "t0").cast("double") + 1
    )
    return (
        horizon.crossJoin(F.broadcast(observed))
        .select(
            "n_orders",
            dround("w_days", 6).alias("avg_wait_days"),
            dround(lam, 6).alias("arrival_rate_per_day"),
            dround(lam * F.col("w_days"), 6).alias("littles_L"),
            dround("obs_l", 6).alias("observed_L"),
        )
    )


# ------------------------------------------- daily-count autocorrelation
@register(
    "events_periodicity_autocorr",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, 8)) AS lag)
    SELECT l.lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {dround_sql("corr(a.n, b.n)", 6)} AS autocorr
    FROM lags l
    JOIN daily a ON TRUE
    JOIN daily b ON b.day = a.day + CAST(l.lag AS INT)
    GROUP BY l.lag
    """,
    description="Autocorrelation of the daily event-count series at lags "
    "1..7 (weekly periodicity screen): the fact table collapses to day "
    "grain in one agg, then each lag is a day-grain self-join + corr() "
    "running moments — no windows, no sort, 7x O(#days) work total.",
)
def events_periodicity_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("day_a"), F.col("n").alias("na"))
    b = daily.select(F.col("day").alias("day_b"), F.col("n").alias("nb"))
    joined = (
        lags.crossJoin(a)
        .join(b, F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag")))
    )
    return joined.groupBy("lag").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        dround(F.corr("na", "nb"), 6).alias("autocorr"),
    )


# ------------------------------------------- partition layout advisor
@register(
    "storage_partition_advisor",
    oracle=f"""
    WITH cands AS (
        SELECT 'event_type' AS candidate, event_type AS k FROM events
        UNION ALL
        SELECT 'day', CAST(CAST(ts AS DATE) AS VARCHAR) FROM events
        UNION ALL
        SELECT 'user_bucket_16', CAST(user_id % 16 AS VARCHAR) FROM events
    ),
    per_part AS (
        SELECT candidate, k, CAST(COUNT(*) AS BIGINT) AS n
        FROM cands GROUP BY candidate, k
    )
    SELECT candidate,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           {dround_sql("CAST(MAX(n) AS DOUBLE) / SUM(n)", 6)} AS max_part_frac,
           {dround_sql("SUM(CAST(n AS DOUBLE) * n) / (SUM(n) * SUM(CAST(n AS DOUBLE)))", 6)} AS expected_scan_frac
    FROM per_part GROUP BY candidate
    """,
    description="Partition-layout advisor: for each candidate partition "
    "key (event_type, day, hashed user bucket) report partition count, "
    "largest-partition fraction (skew ceiling for task balance) and the "
    "expected scan fraction of a random equality predicate (collision "
    "probability sum p_i^2 — the pruning payoff). One grouped agg per "
    "candidate over a single union scan; the advisor output is "
    "O(candidates) rows at any input size.",
)
def storage_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cands = (
        ev.select(
            F.lit("event_type").alias("candidate"),
            F.col("event_type").alias("k"),
        )
        .unionAll(
            ev.select(
                F.lit("day"), F.to_date("ts").cast("string")
            )
        )
        .unionAll(
            ev.select(
                F.lit("user_bucket_16"),
                (F.col("user_id") % 16).cast("string"),
            )
        )
    )
    per_part = cands.groupBy("candidate", "k").agg(
        F.count("*").cast("bigint").alias("n")
    )
    nd = F.col("n").cast("double")
    return per_part.groupBy("candidate").agg(
        F.count("*").cast("bigint").alias("n_partitions"),
        dround(F.max("n").cast("double") / F.sum("n"), 6).alias(
            "max_part_frac"
        ),
        dround(
            F.sum(nd * F.col("n"))
            / (F.sum("n") * F.sum(nd)),
            6,
        ).alias("expected_scan_frac"),
    )


@register(
    "forecast_backtest_mape",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    ),
    laged AS (
        SELECT month, rev,
               ROW_NUMBER() OVER (ORDER BY month) AS rn,
               COUNT(*) OVER () AS n_months,
               LAG(rev, 1) OVER (ORDER BY month) AS f_naive,
               LAG(rev, 12) OVER (ORDER BY month) AS f_snaive,
               (LAG(rev, 1) OVER (ORDER BY month)
                + LAG(rev, 2) OVER (ORDER BY month)
                + LAG(rev, 3) OVER (ORDER BY month)) / 3.0 AS f_ma3
        FROM monthly
    ),
    folds AS (
        SELECT * FROM laged WHERE rn > n_months - 12 AND rn > 12
    ),
    unp AS (
        SELECT 'naive' AS method, rev, f_naive AS f FROM folds
        UNION ALL SELECT 'seasonal_naive', rev, f_snaive FROM folds
        UNION ALL SELECT 'moving_avg_3', rev, f_ma3 FROM folds
    )
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_folds,
           CAST(ROUND(CAST(AVG(abs(rev - f) / rev) AS DECIMAL(38,8)), 6)
                AS DOUBLE) AS mape,
           CAST(ROUND(CAST(AVG(abs(rev - f)) AS DECIMAL(38,8)), 6)
                AS DOUBLE) AS mae
    FROM unp GROUP BY method ORDER BY method
    """,
    description="Rolling-origin forecast backtest: score naive, "
    "seasonal-naive (lag 12), and 3-month moving-average one-step "
    "forecasts over the last 12 months of the monthly revenue series "
    "by MAPE and MAE — the baseline table every forecasting method "
    "(Holt, Holt-Winters, STL here) must beat before deployment, per "
    "the M-competition protocol. One agg shuffle collapses the fact "
    "table to #months rows; lags, folds, and both error metrics are "
    "post-aggregation window math at metadata scale.",
)
def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    w = W.orderBy("month")
    laged = monthly.select(
        "month",
        "rev",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_months"),
        F.lag("rev", 1).over(w).alias("f_naive"),
        F.lag("rev", 12).over(w).alias("f_snaive"),
        (
            (
                F.lag("rev", 1).over(w)
                + F.lag("rev", 2).over(w)
                + F.lag("rev", 3).over(w)
            )
            / 3.0
        ).alias("f_ma3"),
    )
    folds = laged.filter(
        (F.col("rn") > F.col("n_months") - 12) & (F.col("rn") > 12)
    )
    unp = folds.select(
        "rev",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("method"),
                    F.col("f_naive").alias("f"),
                ),
                F.struct(
                    F.lit("seasonal_naive").alias("method"),
                    F.col("f_snaive").alias("f"),
                ),
                F.struct(
                    F.lit("moving_avg_3").alias("method"),
                    F.col("f_ma3").alias("f"),
                ),
            )
        ).alias("mf"),
    ).select("rev", F.col("mf.method").alias("method"), F.col("mf.f").alias("f"))
    return (
        unp.groupBy("method")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_folds"),
            dround(F.avg(F.abs(F.col("rev") - F.col("f")) / F.col("rev")), 6).alias(
                "mape"
            ),
            dround(F.avg(F.abs(F.col("rev") - F.col("f"))), 6).alias("mae"),
        )
        .orderBy("method")
    )


# ------------------------------------- nation-partition modularity
@register(
    "graph_modularity_supplier_nations",
    oracle="""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    deg AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
    nat AS (
        SELECT d.node, d.deg, s.s_nationkey AS nationkey
        FROM deg d JOIN supplier s ON s.s_suppkey = d.node
    ),
    per_nat AS (
        SELECT nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(deg) AS BIGINT) AS nation_degree
        FROM nat GROUP BY nationkey
    ),
    intra AS (
        SELECT nu.nationkey, CAST(COUNT(*) AS BIGINT) AS intra_edges
        FROM edges e
        JOIN nat nu ON nu.node = e.u
        JOIN nat nv ON nv.node = e.v
        WHERE nu.nationkey = nv.nationkey
        GROUP BY nu.nationkey
    ),
    scored AS (
        SELECT p.nationkey, p.n_suppliers, p.nation_degree,
               CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
               CAST(4 * m.m * COALESCE(i.intra_edges, 0)
                    - p.nation_degree * p.nation_degree AS BIGINT) AS num
        FROM per_nat p
        LEFT JOIN intra i ON i.nationkey = p.nationkey
        CROSS JOIN m
    )
    SELECT n.n_name AS nation, s.n_suppliers, s.nation_degree,
           s.intra_edges,
           CAST(ROUND(CAST(CAST(s.num AS DOUBLE)
                / (4.0 * m.m * m.m) AS DECIMAL(38,8)), 6) AS DOUBLE)
               AS q_contrib,
           CAST(ROUND(CAST(CAST((SELECT SUM(num) FROM scored) AS DOUBLE)
                / (4.0 * m.m * m.m) AS DECIMAL(38,8)), 6) AS DOUBLE)
               AS q_total
    FROM scored s
    JOIN nation n ON n.n_nationkey = s.nationkey
    CROSS JOIN m
    """,
    description="Newman modularity of the nation partition on the "
    "supplier co-order graph (suppliers linked when they serve the same "
    "order): per nation, Q_c = e_c/m - (deg_c/2m)^2 — how much more "
    "intra-nation co-supply occurs than a degree-preserving random "
    "rewiring would produce — plus the corpus-wide Q. All counting stays "
    "in BIGINT (per-nation numerator 4*m*e_c - deg_c^2, exact map-side "
    "combinable sums); each published number is ONE integer-ratio "
    "division, so cross-engine float drift is impossible. The edge "
    "build is the same orderkey self-join as the k-core query; the "
    "nation attribution is a broadcast join against the supplier dim. "
    "At 100 TB the degree and intra-edge aggregates are key-partitioned "
    "shuffles on suppkey/nationkey with partial aggregation; the final "
    "per-nation table is dim-sized.",
)
def graph_modularity_supplier_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from healthcare_data_lakehouse_spark.functions import skew as SK

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # r14 (guide §2.4): co-order edges via one per-order posting fold +
    # bounded in-group pair explode instead of the lineitem self-join
    edges = SK.co_occurrence_pairs(li, "l_orderkey", "l_suppkey").persist()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    nat = deg.join(
        F.broadcast(sup), deg["node"] == sup["s_suppkey"]
    ).select("node", "deg", F.col("s_nationkey").alias("nationkey"))
    per_nat = nat.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("deg").cast("bigint").alias("nation_degree"),
    )
    node_nat = F.broadcast(
        nat.select("node", "nationkey")
    )  # supplier-dim sized: one row per graph node
    intra = (
        edges.join(
            node_nat.withColumnsRenamed({"node": "u", "nationkey": "nu"}), "u"
        )
        .join(
            node_nat.withColumnsRenamed({"node": "v", "nationkey": "nv"}), "v"
        )
        .filter(F.col("nu") == F.col("nv"))
        .groupBy(F.col("nu").alias("nationkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    scored = (
        per_nat.join(intra, "nationkey", "left")
        .withColumn(
            "intra_edges", F.coalesce(F.col("intra_edges"), F.lit(0)).cast("bigint")
        )
        .crossJoin(F.broadcast(m))
        .withColumn(
            "num",
            (
                F.lit(4) * F.col("m") * F.col("intra_edges")
                - F.col("nation_degree") * F.col("nation_degree")
            ).cast("bigint"),
        )
    )
    tot = scored.agg(F.sum("num").cast("bigint").alias("num_tot"))
    denom = 4.0 * F.col("m") * F.col("m")
    return (
        scored.crossJoin(F.broadcast(tot))
        .join(F.broadcast(nation), scored["nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            "nation_degree",
            "intra_edges",
            dround(F.col("num").cast("double") / denom, 6).alias("q_contrib"),
            dround(F.col("num_tot").cast("double") / denom, 6).alias("q_total"),
        )
    )


# ------------------------------------------- HITS hubs & authorities
@register(
    "graph_hits_hubs_authorities",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    a1 AS (  -- authority round 1 with h0 = 1: in-degree (exact int)
        SELECT p, CAST(COUNT(*) AS BIGINT) AS a1 FROM edges GROUP BY p
    ),
    h1 AS (  -- hub round 1: sum of neighbour authority scores (exact int)
        SELECT e.s, CAST(SUM(a1.a1) AS BIGINT) AS h1
        FROM edges e JOIN a1 ON e.p = a1.p GROUP BY e.s
    ),
    a2 AS (  -- authority round 2 (exact int)
        SELECT e.p, CAST(SUM(h1.h1) AS BIGINT) AS a2
        FROM edges e JOIN h1 ON e.s = h1.s GROUP BY e.p
    ),
    h2 AS (  -- hub round 2 (exact int)
        SELECT e.s, CAST(SUM(a2.a2) AS BIGINT) AS h2
        FROM edges e JOIN a2 ON e.p = a2.p GROUP BY e.s
    ),
    ta AS (SELECT SUM(a2) AS t FROM a2),
    th AS (SELECT SUM(h2) AS t FROM h2),
    top_a AS (
        SELECT 'authority' AS role, p AS node_id, a2 AS raw_score,
               CAST(ROUND(CAST(CAST(a2 AS DOUBLE) / ta.t AS DECIMAL(38,8)),
                          6) AS DOUBLE) AS norm_score
        FROM a2 CROSS JOIN ta ORDER BY a2 DESC, p LIMIT 10
    ),
    top_h AS (
        SELECT 'hub' AS role, s AS node_id, h2 AS raw_score,
               CAST(ROUND(CAST(CAST(h2 AS DOUBLE) / th.t AS DECIMAL(38,8)),
                          6) AS DOUBLE) AS norm_score
        FROM h2 CROSS JOIN th ORDER BY h2 DESC, s LIMIT 10
    )
    SELECT * FROM top_a UNION ALL SELECT * FROM top_h
    """,
    description="HITS (Kleinberg) over the bipartite supplier->part "
    "order graph: two full mutual-reinforcement rounds (authority = sum "
    "of supplying hubs' scores, hub = sum of supplied authorities' "
    "scores), reported as top-10 per role. Scores stay UNNORMALIZED "
    "INTEGERS through both rounds — normalization is a positive scalar "
    "that never changes HITS rankings, so deferring it to one final "
    "division keeps every intermediate exact and the engines "
    "bit-identical (float power iteration would accumulate "
    "order-dependent ulp drift across joins). Each round is one "
    "shuffle-join + one map-side-combinable agg on the deduped edge "
    "list; round count is fixed, so the job graph is constant-depth at "
    "any scale. Top-10 via TakeOrderedAndProject (per-partition heads, "
    "no global sort partition).",
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # r13 (guide §2.4): cache the bipartite edge list hash-partitioned
    # on p — the authority-side aggregate (groupBy p) and both p-keyed
    # hub->authority joins reuse the cached partitioning, so of the four
    # keyed passes only the s-keyed join re-exchanges the edge list.
    edges = (
        li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .repartition(F.col("p"))
        .persist()
    )
    a1 = edges.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("a1"))
    h1 = (
        edges.join(a1, "p")
        .groupBy("s")
        .agg(F.sum("a1").cast("bigint").alias("h1"))
    )
    a2 = (
        edges.join(h1, "s")
        .groupBy("p")
        .agg(F.sum("h1").cast("bigint").alias("a2"))
    )
    h2 = (
        edges.join(a2, "p")
        .groupBy("s")
        .agg(F.sum("a2").cast("bigint").alias("h2"))
    )
    ta = a2.agg(F.sum("a2").alias("t"))
    th = h2.agg(F.sum("h2").alias("t"))
    top_a = (
        a2.crossJoin(F.broadcast(ta))
        .orderBy(F.col("a2").desc(), "p")
        .limit(10)
        .select(
            F.lit("authority").alias("role"),
            F.col("p").alias("node_id"),
            F.col("a2").alias("raw_score"),
            dround(F.col("a2").cast("double") / F.col("t"), 6).alias(
                "norm_score"
            ),
        )
    )
    top_h = (
        h2.crossJoin(F.broadcast(th))
        .orderBy(F.col("h2").desc(), "s")
        .limit(10)
        .select(
            F.lit("hub").alias("role"),
            F.col("s").alias("node_id"),
            F.col("h2").alias("raw_score"),
            dround(F.col("h2").cast("double") / F.col("t"), 6).alias(
                "norm_score"
            ),
        )
    )
    return top_a.unionByName(top_h)

# ------------------------------------------- AMS tug-of-war F2 sketch
@register(
    "sketch_ams_f2_user_moment",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events GROUP BY user_id
    ),
    signed AS (
        SELECT j.j,
               SUM((1 - 2 * (('0x' || substr(counts.h, j.j + 1, 1))::BIGINT
                             % 2)) * counts.c) AS z
        FROM counts CROSS JOIN (SELECT UNNEST(range(0, 16)) AS j) j
        GROUP BY j.j
    ),
    est AS (SELECT CAST(SUM(z * z) AS BIGINT) AS sz FROM signed),
    exact AS (
        SELECT CAST(SUM(c * c) AS BIGINT) AS f2,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM counts
    )
    SELECT n_users, f2 AS f2_exact,
           {dround_sql("CAST(sz AS DOUBLE) / 16.0", 2)} AS f2_ams,
           {dround_sql(
               "100.0 * (CAST(sz AS DOUBLE) / 16.0 - f2) / f2", 4)}
               AS rel_error_pct
    FROM exact CROSS JOIN est
    """,
    description="AMS (Alon-Matias-Szegedy) tug-of-war sketch estimating "
    "the second frequency moment F2 = sum c_u^2 of the per-user event "
    "distribution — the self-join-size / skew statistic behind join "
    "planning and heavy-hitter detection — against the exact value. "
    "16 independent +-1 sign vectors come from md5 hex-digit parities, "
    "so every Z_j = sum sign*c_u is an EXACT integer (map-side "
    "combinable agg; the 16x expansion rides one explode on the "
    "user-grain aggregate, not the fact table) and the estimate "
    "mean(Z_j^2) stays exact until one final division. In streaming "
    "form the same Z_j update per event is O(16) state total — this is "
    "the batch twin auditing its error. Complements "
    "sketch_join_cardinality_estimate (sampling) with a sketch whose "
    "error bound is distribution-free.",
)
def sketch_ams_f2_user_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).withColumn("h", F.md5(F.col("user_id").cast("string")))
    js = spark.range(0, 16).select(F.col("id").cast("int").alias("j"))
    signed = (
        counts.crossJoin(F.broadcast(js))
        .select(
            "j",
            (
                (
                    1
                    - 2
                    * (
                        F.conv(F.expr("substring(h, j + 1, 1)"), 16, 10)
                        .cast("bigint")
                        % 2
                    )
                )
                * F.col("c")
            ).alias("s"),
        )
        .groupBy("j")
        .agg(F.sum("s").alias("z"))
    )
    est = signed.agg(F.sum(F.col("z") * F.col("z")).cast("bigint").alias("sz"))
    exact = counts.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    ams = F.col("sz").cast("double") / 16.0
    return exact.crossJoin(F.broadcast(est)).select(
        "n_users",
        F.col("f2").alias("f2_exact"),
        dround(ams, 2).alias("f2_ams"),
        dround(100.0 * (ams - F.col("f2")) / F.col("f2"), 4).alias(
            "rel_error_pct"
        ),
    )


# ------------------------------------ sorted-neighborhood entity resolution
@register(
    "er_sorted_neighborhood_pairs",
    oracle="""
    WITH recs AS (
        SELECT c_custkey AS rec_id, c_name AS name FROM customer
        UNION ALL
        SELECT c_custkey + 1000000 AS rec_id,
               substr(c_name, 1, length(c_name) - 1) AS name
        FROM customer WHERE c_custkey % 10 = 3
    ),
    ranked AS (
        SELECT rec_id, name,
               ROW_NUMBER() OVER (ORDER BY name, rec_id) - 1 AS rnk
        FROM recs
    ),
    pairs AS (
        SELECT a.rec_id AS id_a, b.rec_id AS id_b,
               levenshtein(a.name, b.name) AS name_dist,
               b.rnk - a.rnk AS rank_gap
        FROM ranked a JOIN ranked b
          ON b.rnk - a.rnk BETWEEN 1 AND 4
    )
    SELECT id_a, id_b, name_dist, rank_gap FROM pairs
    WHERE name_dist <= 2 AND (id_a >= 1000000 OR id_b >= 1000000)
    """,
    description="Sorted-neighborhood entity resolution (Hernandez & "
    "Stolfo 1995), the OTHER classic blocking family next to "
    "er_fuzzy_customer_match's prefix blocks: all records (masters + "
    "truncated-tail dirty variants) are ranked by sort key ONCE using "
    "the same two-pass range-partition + broadcast-offset scheme as "
    "pipeline_global_row_index (no single-partition sort), then the "
    "sliding window of width 4 becomes a rank-band EQUI-join — each "
    "record probes buckets floor(rnk/4) and floor(rnk/4)+1, so a "
    "candidate pair costs one hash lookup instead of an O(N^2) scan "
    "or a skew-prone range join. Survivors verify with Levenshtein "
    "<= 2 and keep only variant-involved pairs. SNM's value at 100 TB "
    "is that window size (candidate budget) is independent of block-"
    "key skew: a million identical prefixes cannot blow up one "
    "reducer, the window stays 4.",
)
def er_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    masters = cust.select(
        F.col("c_custkey").alias("rec_id"), F.col("c_name").alias("name")
    )
    variants = cust.filter(F.col("c_custkey") % 10 == 3).select(
        (F.col("c_custkey") + 1_000_000).alias("rec_id"),
        F.expr("substr(c_name, 1, length(c_name) - 1)").alias("name"),
    )
    recs = masters.unionAll(variants)
    n_parts = max(spark.sparkContext.defaultParallelism // 2, 4)
    ranged = recs.repartitionByRange(n_parts, "name", "rec_id").withColumn(
        "pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("offset")
    )
    w_local = Window.partitionBy("pid").orderBy("name", "rec_id")
    ranked = (
        ranged.withColumn("lr", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "rec_id", "name", (F.col("offset") + F.col("lr") - 1).alias("rnk")
        )
    )
    win = 4
    a = ranked.select(
        F.col("rec_id").alias("id_a"),
        F.col("name").alias("name_a"),
        F.col("rnk").alias("rnk_a"),
        F.explode(
            F.array(
                F.floor(F.col("rnk") / win), F.floor(F.col("rnk") / win) + 1
            )
        ).alias("gk"),
    )
    b = ranked.select(
        F.col("rec_id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("rnk").alias("rnk_b"),
        F.floor(F.col("rnk") / win).alias("gk"),
    )
    pairs = a.join(b, "gk").filter(
        (F.col("rnk_b") - F.col("rnk_a")).between(1, win)
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("name_dist"),
            (F.col("rnk_b") - F.col("rnk_a")).cast("bigint").alias("rank_gap"),
        )
        .filter(
            (F.col("name_dist") <= 2)
            & ((F.col("id_a") >= 1_000_000) | (F.col("id_b") >= 1_000_000))
        )
    )


# ------------------- Fellegi-Sunter probabilistic record-linkage weights
@register(
    "er_fellegi_sunter_weights",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text, lang, source, n_chars,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    p AS (
        SELECT (a.text = b.text
                OR a.text || ' dup' = b.text
                OR b.text || ' dup' = a.text) AS is_match,
               CAST(a.lang = b.lang AS INT) AS f_lang,
               CAST(a.source = b.source AS INT) AS f_source,
               CAST(abs(a.n_chars - b.n_chars) <= 4 AS INT) AS f_len,
               CAST(a.toks[len(a.toks)] = b.toks[len(b.toks)] AS INT)
                   AS f_last
        FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    ),
    agg AS (
        SELECT feature, agree,
               CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_match,
               CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_nonmatch
        FROM (
            SELECT is_match, 'lang' AS feature, f_lang AS agree FROM p
            UNION ALL
            SELECT is_match, 'source', f_source FROM p
            UNION ALL
            SELECT is_match, 'len_band', f_len FROM p
            UNION ALL
            SELECT is_match, 'last_token', f_last FROM p
        ) GROUP BY feature, agree
    ),
    mu AS (
        SELECT feature,
               CAST(SUM(agree * n_match) AS DOUBLE)
                   / NULLIF(SUM(n_match), 0) AS m_prob,
               CAST(SUM(agree * n_nonmatch) AS DOUBLE)
                   / NULLIF(SUM(n_nonmatch), 0) AS u_prob,
               CAST(SUM(n_match) AS BIGINT) AS n_match_pairs,
               CAST(SUM(n_nonmatch) AS BIGINT) AS n_nonmatch_pairs
        FROM agg GROUP BY feature
    )
    SELECT feature,
           n_match_pairs, n_nonmatch_pairs,
           {dround_sql('m_prob', 6)} AS m_prob,
           {dround_sql('u_prob', 6)} AS u_prob,
           {dround_sql('log2(NULLIF(m_prob, 0) / NULLIF(u_prob, 0))', 4)}
               AS agreement_weight,
           {dround_sql('log2(NULLIF(1 - m_prob, 0) / NULLIF(1 - u_prob, 0))',
                       4)} AS disagreement_weight
    FROM mu ORDER BY feature
    """,
    description="Fellegi-Sunter probabilistic record linkage (JASA 1969) "
    "— the decision-theoretic core of Splink/dedupe-style ER engines: "
    "for each comparison feature, estimate m = P(agree | match) and "
    "u = P(agree | non-match) over a BLOCKED candidate set and emit the "
    "log2 agreement/disagreement weights that score pairs. Candidates "
    "block on the first-2-token prefix (equi-join, never all-pairs — at "
    "100 TB the block key is what keeps FS trainable), truth labels "
    "derive from the fixture's planted-dup relation (text equality up "
    "to the ' dup' marker), and the four features expose exactly what "
    "FS is for: len_band separates cleanly (m = 1.0 by the dup "
    "construction, u ~ 0.03, weight ~ +5), while lang/source/last_token "
    "hover at chance (the generator draws them independently of the dup "
    "relation, so their weights correctly land near 0 — the estimator "
    "doesn't invent signal that isn't there). NULLIF guards keep "
    "zero-cell features NULL on both engines — live on this fixture: "
    "len_band's disagreement weight is NULL because m = 1.0. All "
    "probabilities/weights dround()-stabilized. "
    "The m/u estimation is two scalar aggregates per feature over the "
    "pair table — the EM refinement loop production FS uses starts "
    "from exactly these counts.",
)
def er_fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", "text", "lang", "source", "n_chars",
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias(
                "blk"
            ),
            F.element_at(F.split("text", " "), -1).alias("last_tok"),
        )
    )
    a = d.select(*[F.col(c).alias(f"{c}_a") for c in d.columns])
    b = d.select(*[F.col(c).alias(f"{c}_b") for c in d.columns])
    pairs = a.join(
        b, (F.col("blk_a") == F.col("blk_b"))
        & (F.col("doc_id_a") < F.col("doc_id_b"))
    ).select(
        (
            (F.col("text_a") == F.col("text_b"))
            | (F.concat(F.col("text_a"), F.lit(" dup")) == F.col("text_b"))
            | (F.concat(F.col("text_b"), F.lit(" dup")) == F.col("text_a"))
        ).alias("is_match"),
        (F.col("lang_a") == F.col("lang_b")).cast("int").alias("lang"),
        (F.col("source_a") == F.col("source_b")).cast("int").alias("source"),
        (F.abs(F.col("n_chars_a") - F.col("n_chars_b")) <= 4)
        .cast("int")
        .alias("len_band"),
        (F.col("last_tok_a") == F.col("last_tok_b"))
        .cast("int")
        .alias("last_token"),
    )
    feats = pairs.select(
        "is_match",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.col(name).alias("agree"),
                    )
                    for name in ("lang", "source", "len_band", "last_token")
                ]
            )
        ).alias("fa"),
    ).select("is_match", "fa.feature", "fa.agree")
    mu = feats.groupBy("feature").agg(
        F.sum(F.when(F.col("is_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_match_pairs"),
        F.sum(F.when(F.col("is_match"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_nonmatch_pairs"),
        (
            F.sum(F.when(F.col("is_match"), F.col("agree")).otherwise(0))
            .cast("double")
            / F.nullif(
                F.sum(F.when(F.col("is_match"), 1).otherwise(0)), F.lit(0)
            )
        ).alias("m_raw"),
        (
            F.sum(F.when(F.col("is_match"), 0).otherwise(F.col("agree")))
            .cast("double")
            / F.nullif(
                F.sum(F.when(F.col("is_match"), 0).otherwise(1)), F.lit(0)
            )
        ).alias("u_raw"),
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    return mu.select(
        "feature",
        "n_match_pairs",
        "n_nonmatch_pairs",
        dround(F.col("m_raw"), 6).alias("m_prob"),
        dround(F.col("u_raw"), 6).alias("u_prob"),
        dround(
            log2(
                F.nullif(F.col("m_raw"), F.lit(0.0))
                / F.nullif(F.col("u_raw"), F.lit(0.0))
            ),
            4,
        ).alias("agreement_weight"),
        dround(
            log2(
                F.nullif(F.lit(1.0) - F.col("m_raw"), F.lit(0.0))
                / F.nullif(F.lit(1.0) - F.col("u_raw"), F.lit(0.0))
            ),
            4,
        ).alias("disagreement_weight"),
    ).orderBy("feature")


# --------------------------- forecast: Theta method (A&N 2000, M3 winner)
_THETA_H = 6


def _theta_oracle() -> str:
    st = "(n*(n+1)/2.0)"
    stt = "(CAST(n AS DOUBLE)*(n+1)*(2*n+1)/6.0)"
    slope = dround_sql(
        f"(n*sty - {st}*sy) / (n*{stt} - {st}*{st})", 6
    )
    return f"""
    WITH RECURSIVE monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ) AS rn
        FROM orders GROUP BY 1
    ),
    mom AS (
        SELECT COUNT(*) AS n,
               list_sum(list(rev ORDER BY rn)) AS sy,
               list_sum(list(rn * rev ORDER BY rn)) AS sty
        FROM monthly
    ),
    reg0 AS (SELECT n, sy, {slope} AS slope FROM mom),
    reg AS (
        SELECT n, slope,
               {dround_sql(f"(sy - slope*{st}) / n", 6)} AS intercept
        FROM reg0
    ),
    ses AS (
        SELECT m.rn, m.month, m.rev,
               CAST(2.0*m.rev - (r.intercept + r.slope*m.rn) AS DOUBLE) AS s,
               CAST(NULL AS DOUBLE) AS f
        FROM monthly m, reg r WHERE m.rn = 1
        UNION ALL
        SELECT m.rn, m.month, m.rev,
               0.5*(2.0*m.rev - (r.intercept + r.slope*m.rn)) + 0.5*h.s,
               0.5*(r.intercept + r.slope*m.rn) + 0.5*h.s
        FROM ses h JOIN monthly m ON m.rn = h.rn + 1, reg r
    ),
    lastrow AS (
        SELECT s.month, s.s, r.n, r.slope, r.intercept
        FROM ses s, reg r WHERE s.rn = r.n
    )
    SELECT month, rev,
           {dround_sql("r.intercept + r.slope*s.rn", 4)} AS trend_line,
           {dround_sql("s.s", 4)} AS ses_level,
           {dround_sql("s.f", 4)} AS fitted,
           FALSE AS is_forecast
    FROM ses s, reg r
    UNION ALL
    SELECT CAST(l.month + u.h * INTERVAL 1 MONTH AS DATE),
           CAST(NULL AS DOUBLE),
           {dround_sql("l.intercept + l.slope*(l.n + u.h)", 4)},
           CAST(NULL AS DOUBLE),
           {dround_sql(
               "0.5*(l.intercept + l.slope*(l.n + u.h)) + 0.5*l.s", 4)},
           TRUE
    FROM lastrow l, UNNEST(range(1, {_THETA_H} + 1)) AS u(h)
    """


@register(
    "forecast_theta_monthly_revenue",
    oracle=_theta_oracle(),
    description="Theta-method forecast (Assimakopoulos & Nikolopoulos "
    "2000 — the M3-competition winner, equivalent to SES with drift per "
    "Hyndman & Billah 2003) over monthly order revenue: theta-0 line = "
    "OLS linear trend on t=1..n, theta-2 line z_t = 2*y_t - trend_t "
    "smoothed by SES (alpha=0.5, binary-exact), fitted = equal-weight "
    "combination of the two lines one step ahead, plus a 6-month-ahead "
    "forecast fan. One agg shuffle collapses 100 TB of orders to a "
    "#months-row series; the OLS moment sums fold SEQUENTIALLY over the "
    "sorted month array (bit-parity with the oracle's ordered-list "
    "sums — St/Stt are closed-form integers), slope/intercept are "
    "dround-pinned before the SES recurrence so both engines smooth the "
    "identical theta-2 line, and the recurrence runs as one F.aggregate "
    "fold at metadata scale — the same plan shape as "
    "forecast_holt_monthly_revenue.",
)
def forecast_theta_monthly_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    series = monthly.agg(
        F.sort_array(F.collect_list(F.struct("month", "rev"))).alias("s")
    )
    base = series.select(
        "s",
        F.size("s").alias("n"),
        F.aggregate("s", F.lit(0.0), lambda a, x: a + x["rev"]).alias("sy"),
        F.aggregate(
            F.col("s"),
            F.struct(F.lit(0).alias("i"), F.lit(0.0).alias("sty")),
            lambda a, x: F.struct(
                (a["i"] + 1).alias("i"),
                (a["sty"] + (a["i"] + 1).cast("double") * x["rev"]).alias(
                    "sty"
                ),
            ),
        )["sty"].alias("sty"),
    )
    nn = F.col("n").cast("double")
    st = (F.col("n") * (F.col("n") + 1) / 2).cast("double")
    stt = (
        F.col("n").cast("double") * (F.col("n") + 1) * (2 * F.col("n") + 1) / 6
    )
    params = base.select(
        "s",
        "n",
        "sy",
        dround(
            (nn * F.col("sty") - st * F.col("sy")) / (nn * stt - st * st), 6
        ).alias("slope"),
    ).select(
        "s",
        "n",
        "slope",
        dround((F.col("sy") - F.col("slope") * st) / nn, 6).alias("intercept"),
    )

    def step(acc, x):
        first = acc["i"] == 0
        t = (acc["i"] + 1).cast("double")
        trend = F.col("intercept") + F.col("slope") * t
        z = 2.0 * x["rev"] - trend
        prev_s = acc["s"]
        new_s = F.when(first, z).otherwise(0.5 * z + 0.5 * prev_s)
        row = F.struct(
            x["month"].alias("month"),
            x["rev"].alias("rev"),
            dround(trend, 4).alias("trend_line"),
            dround(new_s, 4).alias("ses_level"),
            F.when(first, F.lit(None).cast("double"))
            .otherwise(dround(0.5 * trend + 0.5 * prev_s, 4))
            .alias("fitted"),
        )
        return F.struct(
            F.concat(acc["rows"], F.array(row)).alias("rows"),
            new_s.alias("s"),
            (acc["i"] + 1).alias("i"),
        )

    init = F.struct(
        F.array()
        .cast(
            "array<struct<month:date,rev:double,trend_line:double,"
            "ses_level:double,fitted:double>>"
        )
        .alias("rows"),
        F.lit(0.0).alias("s"),
        F.lit(0).alias("i"),
    )
    folded = params.select(
        "n",
        "slope",
        "intercept",
        F.element_at(F.col("s"), -1)["month"].alias("last_month"),
        F.aggregate(F.col("s"), init, step).alias("acc"),
    )
    insample = folded.select(
        F.explode(F.col("acc")["rows"]).alias("r")
    ).select(
        "r.month",
        "r.rev",
        "r.trend_line",
        "r.ses_level",
        "r.fitted",
        F.lit(False).alias("is_forecast"),
    )
    fut = (
        folded.select(
            "n",
            "slope",
            "intercept",
            "last_month",
            F.col("acc")["s"].alias("s_n"),
            F.explode(F.expr(f"sequence(1, {_THETA_H})")).alias("h"),
        )
        .select(
            F.add_months(F.col("last_month"), F.col("h")).alias("month"),
            F.lit(None).cast("double").alias("rev"),
            dround(
                F.col("intercept")
                + F.col("slope") * (F.col("n") + F.col("h")).cast("double"),
                4,
            ).alias("trend_line"),
            F.lit(None).cast("double").alias("ses_level"),
            dround(
                0.5
                * (
                    F.col("intercept")
                    + F.col("slope") * (F.col("n") + F.col("h")).cast("double")
                )
                + 0.5 * F.col("s_n"),
                4,
            ).alias("fitted"),
            F.lit(True).alias("is_forecast"),
        )
    )
    return insample.unionAll(fut)


# ------------------- forecast: Croston's method for intermittent demand
@register(
    "forecast_croston_demand",
    oracle=f"""
    WITH RECURSIVE wk AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
               COUNT(*) AS d
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_custkey % 19 = 0
        GROUP BY 1
    ),
    span AS (SELECT MIN(week) AS w0, MAX(week) AS w1 FROM wk),
    spine AS (
        SELECT ROW_NUMBER() OVER (ORDER BY g.week) AS rn,
               CAST(g.week AS DATE) AS week,
               COALESCE(wk.d, 0) AS d
        FROM (
            SELECT UNNEST(generate_series(w0, w1, INTERVAL 7 DAY)) AS week
            FROM span
        ) g LEFT JOIN wk ON CAST(g.week AS DATE) = wk.week
    ),
    cro AS (
        SELECT rn, week, d,
               CASE WHEN d > 0 THEN CAST(d AS DOUBLE) END AS z,
               CASE WHEN d > 0 THEN CAST(1 AS DOUBLE) END AS p,
               CASE WHEN d > 0 THEN 0 ELSE 1 END AS q,
               (d > 0) AS started
        FROM spine WHERE rn = 1
        UNION ALL
        SELECT s.rn, s.week, s.d,
               CASE WHEN s.d = 0 THEN c.z
                    WHEN NOT c.started THEN CAST(s.d AS DOUBLE)
                    ELSE 0.5*s.d + 0.5*c.z END,
               CASE WHEN s.d = 0 THEN c.p
                    WHEN NOT c.started THEN CAST(c.q + 1 AS DOUBLE)
                    ELSE 0.5*(c.q + 1) + 0.5*c.p END,
               CASE WHEN s.d > 0 THEN 0 ELSE c.q + 1 END,
               c.started OR s.d > 0
        FROM cro c JOIN spine s ON s.rn = c.rn + 1
    )
    SELECT week, CAST(d AS BIGINT) AS demand,
           {dround_sql("z", 4)} AS z_size,
           {dround_sql("p", 4)} AS p_interval,
           {dround_sql("z / p", 4)} AS croston_forecast
    FROM cro
    """,
    description="Croston's method (1972) for intermittent demand — the "
    "standard forecaster for sparse series (most weeks zero): separate "
    "SES (alpha=0.5, binary-exact) on the nonzero demand SIZES and on "
    "the inter-demand INTERVALS, forecast = size/interval. The demand "
    "series (weekly urgent-order count from a 1-in-19 customer cohort; "
    "67% zero weeks at oracle scale) is one map-side-combined groupBy "
    "over 100 TB of orders; the week spine and the Croston recurrence "
    "run at week grain as a single F.aggregate fold over the sorted "
    "spine — metadata scale, the same plan shape as the Holt/Theta "
    "forecasters. Convention (pinned in both engines): state updates "
    "only on demand weeks, p initializes to the 1-based index of the "
    "first demand week, zero weeks carry state forward, and "
    "z/p/forecast are NULL before the first demand.",
)
def forecast_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    wk = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_custkey") % 19 == 0)
        )
        .groupBy(F.trunc(F.to_date("o_orderdate"), "week").alias("week"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    span = wk.agg(F.min("week").alias("w0"), F.max("week").alias("w1"))
    spine = span.select(
        F.explode(F.expr("sequence(w0, w1, interval 7 day)")).alias("week")
    )
    series = spine.join(wk, "week", "left").select(
        "week", F.coalesce("d", F.lit(0)).cast("bigint").alias("d")
    )
    arr = series.agg(
        F.sort_array(F.collect_list(F.struct("week", "d"))).alias("s")
    )

    def step(acc, x):
        qp = acc["q"] + 1
        has = x["d"] > 0
        z_new = (
            F.when(~has, acc["z"])
            .when(~acc["started"], x["d"].cast("double"))
            .otherwise(0.5 * x["d"] + 0.5 * acc["z"])
        )
        p_new = (
            F.when(~has, acc["p"])
            .when(~acc["started"], qp.cast("double"))
            .otherwise(0.5 * qp.cast("double") + 0.5 * acc["p"])
        )
        row = F.struct(
            x["week"].alias("week"),
            x["d"].alias("demand"),
            dround(z_new, 4).alias("z_size"),
            dround(p_new, 4).alias("p_interval"),
            dround(z_new / p_new, 4).alias("croston_forecast"),
        )
        return F.struct(
            F.concat(acc["rows"], F.array(row)).alias("rows"),
            z_new.alias("z"),
            p_new.alias("p"),
            F.when(has, F.lit(0)).otherwise(qp).alias("q"),
            (acc["started"] | has).alias("started"),
        )

    init = F.struct(
        F.array()
        .cast(
            "array<struct<week:date,demand:bigint,z_size:double,"
            "p_interval:double,croston_forecast:double>>"
        )
        .alias("rows"),
        F.lit(None).cast("double").alias("z"),
        F.lit(None).cast("double").alias("p"),
        F.lit(0).alias("q"),
        F.lit(False).alias("started"),
    )
    return (
        arr.select(F.aggregate(F.col("s"), init, step)["rows"].alias("rows"))
        .select(F.explode("rows").alias("r"))
        .select(
            "r.week", "r.demand", "r.z_size", "r.p_interval",
            "r.croston_forecast",
        )
    )


# ---------------- Fellegi-Sunter EM parameter estimation (Winkler 1988)
_EM_ITERS = 20
_EM_FEATS = ("lang", "source", "len_band", "last_token")


def _er_em_oracle() -> str:
    """Unrolled-CTE EM over the 16-row comparison-pattern table.

    Every per-iteration sum runs over an ORDERED pattern list
    (list_sum folds in list order), mirroring the Spark side's
    sorted sequential Python accumulation — bit-parity by
    construction, the same discipline as the forecast folds."""
    g_expr = (
        "i.lam * "
        "((CASE WHEN p.f1 = 1 THEN i.m1 ELSE 1.0 - i.m1 END)"
        " * (CASE WHEN p.f2 = 1 THEN i.m2 ELSE 1.0 - i.m2 END)"
        " * (CASE WHEN p.f3 = 1 THEN i.m3 ELSE 1.0 - i.m3 END)"
        " * (CASE WHEN p.f4 = 1 THEN i.m4 ELSE 1.0 - i.m4 END))"
        " / (i.lam * "
        "((CASE WHEN p.f1 = 1 THEN i.m1 ELSE 1.0 - i.m1 END)"
        " * (CASE WHEN p.f2 = 1 THEN i.m2 ELSE 1.0 - i.m2 END)"
        " * (CASE WHEN p.f3 = 1 THEN i.m3 ELSE 1.0 - i.m3 END)"
        " * (CASE WHEN p.f4 = 1 THEN i.m4 ELSE 1.0 - i.m4 END))"
        " + (1.0 - i.lam) * "
        "((CASE WHEN p.f1 = 1 THEN i.u1 ELSE 1.0 - i.u1 END)"
        " * (CASE WHEN p.f2 = 1 THEN i.u2 ELSE 1.0 - i.u2 END)"
        " * (CASE WHEN p.f3 = 1 THEN i.u3 ELSE 1.0 - i.u3 END)"
        " * (CASE WHEN p.f4 = 1 THEN i.u4 ELSE 1.0 - i.u4 END)))"
    )
    head = """
    WITH d AS (
        SELECT doc_id, text, lang, source, n_chars,
               array_to_string(string_split(text, ' ')[1:2], ' ') AS blk,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    pr AS (
        SELECT CAST(a.lang = b.lang AS INT) AS f1,
               CAST(a.source = b.source AS INT) AS f2,
               CAST(abs(a.n_chars - b.n_chars) <= 4 AS INT) AS f3,
               CAST(a.toks[len(a.toks)] = b.toks[len(b.toks)] AS INT) AS f4
        FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    ),
    pat AS (
        SELECT f1, f2, f3, f4, COUNT(*) AS c
        FROM pr GROUP BY f1, f2, f3, f4
    ),
    pats AS (
        SELECT list(struct_pack(
                   c := CAST(c AS DOUBLE), f1 := f1, f2 := f2,
                   f3 := f3, f4 := f4)
                   ORDER BY f1, f2, f3, f4) AS ps,
               CAST(SUM(c) AS DOUBLE) AS cd,
               CAST(SUM(c) AS BIGINT) AS n_pairs
        FROM pat
    ),
    it0 AS (
        SELECT CAST(0.1 AS DOUBLE) AS lam,
               CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
               CAST(0.9 AS DOUBLE) AS m3, CAST(0.9 AS DOUBLE) AS m4,
               CAST(0.1 AS DOUBLE) AS u1, CAST(0.1 AS DOUBLE) AS u2,
               CAST(0.1 AS DOUBLE) AS u3, CAST(0.1 AS DOUBLE) AS u4
    )"""
    steps = []
    for k in range(_EM_ITERS):
        steps.append(f"""
    g{k} AS MATERIALIZED (
        SELECT list_transform(ps, p -> struct_pack(
                   c := p.c, f1 := p.f1, f2 := p.f2, f3 := p.f3,
                   f4 := p.f4, g := {g_expr})) AS gs,
               cd
        FROM pats, it{k} i
    ),
    it{k + 1} AS MATERIALIZED (
        SELECT w / cd AS lam,
               sm1 / w AS m1, sm2 / w AS m2, sm3 / w AS m3, sm4 / w AS m4,
               su1 / (cd - w) AS u1, su2 / (cd - w) AS u2,
               su3 / (cd - w) AS u3, su4 / (cd - w) AS u4
        FROM (
            SELECT list_sum(list_transform(gs, x -> x.c * x.g)) AS w,
                   list_sum(list_transform(gs, x -> x.c * x.g * x.f1)) AS sm1,
                   list_sum(list_transform(gs, x -> x.c * x.g * x.f2)) AS sm2,
                   list_sum(list_transform(gs, x -> x.c * x.g * x.f3)) AS sm3,
                   list_sum(list_transform(gs, x -> x.c * x.g * x.f4)) AS sm4,
                   list_sum(list_transform(gs,
                       x -> x.c * (1.0 - x.g) * x.f1)) AS su1,
                   list_sum(list_transform(gs,
                       x -> x.c * (1.0 - x.g) * x.f2)) AS su2,
                   list_sum(list_transform(gs,
                       x -> x.c * (1.0 - x.g) * x.f3)) AS su3,
                   list_sum(list_transform(gs,
                       x -> x.c * (1.0 - x.g) * x.f4)) AS su4,
                   cd
            FROM g{k}
        )
    )""")
    feats = []
    for j, name in enumerate(_EM_FEATS, start=1):
        feats.append(f"""
        SELECT '{name}' AS feature,
               {dround_sql(f"i.m{j}", 6)} AS m_em,
               {dround_sql(f"i.u{j}", 6)} AS u_em,
               {dround_sql(
                   f"log2(NULLIF(i.m{j}, 0) / NULLIF(i.u{j}, 0))", 4
               )} AS agreement_weight,
               {dround_sql("i.lam", 6)} AS lambda_em,
               p.n_pairs
        FROM it{_EM_ITERS} i, pats p""")
    return head + "," + ",".join(steps) + "\n" + "\n UNION ALL ".join(
        feats
    ) + "\n ORDER BY feature"


@register(
    "er_em_mu_estimation",
    oracle=_er_em_oracle(),
    description="UNSUPERVISED Fellegi-Sunter parameter estimation via EM "
    "(Winkler 1988) — the training loop behind Splink/fastLink-style "
    "probabilistic linkage, and the promised refinement of "
    "er_fellegi_sunter_weights' labeled counts: over the SAME blocked "
    "candidate pairs (first-2-token prefix block, never all-pairs) but "
    "with NO truth labels, the 4 binary comparison features collapse to "
    "a <=16-row pattern-count table (one map-side-combined groupBy over "
    "any corpus size — the EM never touches pair grain), then 20 EM "
    "iterations under conditional independence re-estimate lambda = "
    "P(match), m_k = P(agree_k | match), u_k = P(agree_k | non-match) "
    "from pattern counts alone. The iteration runs driver-side over the "
    "16 collected rows (metadata scale by construction, the "
    "events_markov_stationary precedent) in SORTED pattern order with "
    "sequential accumulation — bit-parity with the oracle's "
    "ordered-list list_sum folds. On this fixture EM recovers the "
    "structure the labeled estimator found: len_band separates "
    "(m ~ 1, u ~ small) while lang/source/last_token converge toward "
    "chance agreement rates.",
)
def er_em_mu_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("blk"),
        F.element_at(F.split("text", " "), -1).alias("last_tok"),
    )
    a = d.select(*[F.col(c).alias(f"{c}_a") for c in d.columns])
    b = d.select(*[F.col(c).alias(f"{c}_b") for c in d.columns])
    pat = (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("doc_id_a") < F.col("doc_id_b")),
        )
        .select(
            (F.col("lang_a") == F.col("lang_b")).cast("int").alias("f1"),
            (F.col("source_a") == F.col("source_b")).cast("int").alias("f2"),
            (F.abs(F.col("n_chars_a") - F.col("n_chars_b")) <= 4)
            .cast("int")
            .alias("f3"),
            (F.col("last_tok_a") == F.col("last_tok_b"))
            .cast("int")
            .alias("f4"),
        )
        .groupBy("f1", "f2", "f3", "f4")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # <= 2^4 = 16 pattern rows: metadata scale by construction
    )
    pats = sorted(
        ((int(r.c), r.f1, r.f2, r.f3, r.f4) for r in pat),
        key=lambda t: (t[1], t[2], t[3], t[4]),
    )
    n_pairs = sum(c for c, *_ in pats)
    cd = float(n_pairs)
    lam = 0.1
    m = [0.9, 0.9, 0.9, 0.9]
    u = [0.1, 0.1, 0.1, 0.1]
    for _ in range(_EM_ITERS):
        w = 0.0
        sm = [0.0, 0.0, 0.0, 0.0]
        su = [0.0, 0.0, 0.0, 0.0]
        for c, f1, f2, f3, f4 in pats:
            cf = float(c)
            fs = (f1, f2, f3, f4)
            pm = 1.0
            pu = 1.0
            for j in range(4):
                pm = pm * (m[j] if fs[j] == 1 else 1.0 - m[j])
                pu = pu * (u[j] if fs[j] == 1 else 1.0 - u[j])
            g = lam * pm / (lam * pm + (1.0 - lam) * pu)
            w += cf * g
            for j in range(4):
                sm[j] += cf * g * fs[j]
                su[j] += cf * (1.0 - g) * fs[j]
        lam = w / cd
        m = [sm[j] / w for j in range(4)]
        u = [su[j] / (cd - w) for j in range(4)]
    out = spark.createDataFrame(
        [
            (name, m[j], u[j], lam, n_pairs)
            for j, name in enumerate(_EM_FEATS)
        ],
        "feature string, m_raw double, u_raw double, lam double, "
        "n_pairs bigint",
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    return out.select(
        "feature",
        dround("m_raw", 6).alias("m_em"),
        dround("u_raw", 6).alias("u_em"),
        dround(
            log2(
                F.nullif(F.col("m_raw"), F.lit(0.0))
                / F.nullif(F.col("u_raw"), F.lit(0.0))
            ),
            4,
        ).alias("agreement_weight"),
        dround("lam", 6).alias("lambda_em"),
        "n_pairs",
    ).orderBy("feature")


# ---------------- newsvendor critical-fractile stocking (Arrow 1951)
@register(
    "orders_newsvendor_quantile",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS d
        FROM orders GROUP BY 1, 2
    ),
    ranked AS (
        SELECT priority, d,
               ROW_NUMBER() OVER (PARTITION BY priority ORDER BY d, day)
                   AS rn,
               COUNT(*) OVER (PARTITION BY priority) AS n
        FROM daily
    ),
    qstar AS (
        SELECT priority, n AS n_days, d AS q_star
        FROM ranked WHERE rn = CAST(ceil(0.9 * n) AS BIGINT)
    ),
    cost AS (
        SELECT d.priority,
               SUM(GREATEST(d.d - q.q_star, 0)) AS under_units,
               SUM(GREATEST(q.q_star - d.d, 0)) AS over_units,
               COUNT(*) AS nd
        FROM daily d JOIN qstar q ON q.priority = d.priority
        GROUP BY d.priority
    )
    SELECT q.priority, q.n_days, q.q_star,
           {dround_sql("CAST(c.under_units AS DOUBLE) / c.nd", 4)}
               AS exp_daily_underage,
           {dround_sql("CAST(c.over_units AS DOUBLE) / c.nd", 4)}
               AS exp_daily_overage,
           {dround_sql(
               "(9.0 * c.under_units + 1.0 * c.over_units) / c.nd", 4
           )} AS exp_daily_cost
    FROM qstar q JOIN cost c ON c.priority = q.priority
    ORDER BY q.priority
    """,
    description="Newsvendor critical-fractile stocking (Arrow et al. "
    "1951) per order priority: with underage cost 9 and overage cost 1 "
    "the optimal stock is the cu/(cu+co) = 0.9 fractile of daily "
    "demand, taken as the EXACT ceil(0.9n)-th order statistic of the "
    "per-priority daily order counts (integer demand, day tiebreak — "
    "engine-exact selection, no interpolation ambiguity), and the "
    "realized expected daily underage/overage/cost at q* ride along "
    "from a second pass over the same demand table. The rank windows "
    "are PARTITIONED BY priority over day-grain aggregates (bounded by "
    "calendar span x 5 priorities at any volume); at 100 TB the only "
    "data-scale pass is the first groupBy. This is the inventory "
    "counterpart of the quantile machinery the catalog already audits "
    "(exact median, conformal order statistic).",
)
def orders_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    wr = Window.partitionBy("priority").orderBy("d", "day")
    wn = Window.partitionBy("priority")
    ranked = daily.select(
        "priority",
        "d",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    qstar = ranked.filter(
        F.col("rn") == F.ceil(0.9 * F.col("n")).cast("bigint")
    ).select("priority", F.col("n").alias("n_days"), F.col("d").alias("q_star"))
    cost = (
        daily.join(qstar.select("priority", "q_star"), "priority")
        .groupBy("priority")
        .agg(
            F.sum(F.greatest(F.col("d") - F.col("q_star"), F.lit(0))).alias(
                "under_units"
            ),
            F.sum(F.greatest(F.col("q_star") - F.col("d"), F.lit(0))).alias(
                "over_units"
            ),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    return (
        qstar.join(cost, "priority")
        .select(
            "priority",
            "n_days",
            "q_star",
            dround(
                F.col("under_units").cast("double") / F.col("nd"), 4
            ).alias("exp_daily_underage"),
            dround(
                F.col("over_units").cast("double") / F.col("nd"), 4
            ).alias("exp_daily_overage"),
            dround(
                (9.0 * F.col("under_units") + 1.0 * F.col("over_units"))
                / F.col("nd"),
                4,
            ).alias("exp_daily_cost"),
        )
        .orderBy("priority")
    )


# ------------- STL-residual anomaly days (decompose -> robust flag)
@register(
    "quality_anomaly_stl_residual",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT day, rev,
               {dround_sql(
                   "AVG(rev) OVER (ORDER BY day "
                   "ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING)", 4)}
                   AS trend
        FROM daily
    ),
    d AS (SELECT day, rev, trend, rev - trend AS detr FROM t),
    s AS (
        SELECT day, rev, trend, detr,
               {dround_sql("AVG(detr) OVER (PARTITION BY dayofweek(day))",
                           4)} AS seasonal
        FROM d
    ),
    r AS (
        SELECT day, rev, trend, seasonal,
               {dround_sql("detr - seasonal", 4)} AS resid
        FROM s
    ),
    med AS (
        SELECT resid AS med_r FROM (
            SELECT resid, ROW_NUMBER() OVER (ORDER BY resid, day) AS rn,
                   COUNT(*) OVER () AS n
            FROM r
        ) WHERE rn = (n + 1) // 2
    ),
    absdev AS (
        SELECT r.day, r.rev, r.trend, r.seasonal, r.resid,
               ABS(r.resid - m.med_r) AS ad
        FROM r, med m
    ),
    mad AS (
        SELECT ad AS mad_r FROM (
            SELECT ad, ROW_NUMBER() OVER (ORDER BY ad, day) AS rn,
                   COUNT(*) OVER () AS n
            FROM absdev
        ) WHERE rn = (n + 1) // 2
    )
    SELECT a.day, a.rev, a.trend, a.seasonal, a.resid,
           {dround_sql(
               "(a.resid - m.med_r) / (1.4826 * d.mad_r)", 4
           )} AS robust_z
    FROM absdev a, med m, mad d
    WHERE ABS((a.resid - m.med_r) / (1.4826 * d.mad_r)) > 3.0
    ORDER BY a.day
    """,
    description="Anomalous-revenue-day detection via STL-style "
    "decomposition plus a robust residual flag — the standard "
    "production anomaly recipe (decompose out what is EXPLAINED — "
    "centered 29-day trend, day-of-week seasonal — then flag what "
    "remains): robust z = (residual - median) / (1.4826 * MAD) with "
    "|z| > 3 as the alarm line; median/MAD resist the very outliers "
    "being hunted, which a mean/sigma rule would absorb. Medians are "
    "exact lower-median order statistics with day tiebreaks "
    "(engine-exact selection); trend/seasonal/residual are "
    "dround-pinned before the flag so the alarm set cannot differ by "
    "a ulp across engines. One agg shuffle collapses 100 TB to the "
    "day-grain series; every window after that is post-aggregation "
    "metadata scale (GLOBAL_WINDOW_OK).",
)
def quality_anomaly_stl_residual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w29 = Window.orderBy("day").rowsBetween(-14, 14)
    t = daily.withColumn("trend", dround(F.avg("rev").over(w29), 4))
    d = t.withColumn("detr", F.col("rev") - F.col("trend"))
    s = d.withColumn(
        "seasonal",
        dround(
            F.avg("detr").over(Window.partitionBy(F.dayofweek("day"))), 4
        ),
    )
    r = s.select(
        "day",
        "rev",
        "trend",
        "seasonal",
        dround(F.col("detr") - F.col("seasonal"), 4).alias("resid"),
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        wrk = Window.orderBy(col, "day")
        return (
            df.withColumn("rn", F.row_number().over(wrk))
            .withColumn(
                "n",
                F.count(F.lit(1)).over(
                    Window.rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
            .filter(
                F.col("rn")
                == F.floor((F.col("n") + 1) / 2).cast("bigint")
            )
            .select(F.col(col).alias(f"med_{col}"))
        )

    med = lower_median(r, "resid")
    absdev = r.crossJoin(F.broadcast(med)).withColumn(
        "ad", F.abs(F.col("resid") - F.col("med_resid"))
    )
    mad = lower_median(absdev, "ad")
    z = (F.col("resid") - F.col("med_resid")) / (
        1.4826 * F.col("med_ad")
    )
    return (
        absdev.crossJoin(F.broadcast(mad))
        .filter(F.abs(z) > 3.0)
        .select(
            "day",
            "rev",
            "trend",
            "seasonal",
            "resid",
            dround(z, 4).alias("robust_z"),
        )
        .orderBy("day")
    )


# -------------- absorbing-chain expected steps to conversion
_ABS_ITERS = 40


def _absorbing_oracle() -> str:
    head = """
    WITH seq AS MATERIALIZED (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts,
                   event_id) AS prev_type
        FROM events
    ),
    counts AS MATERIALIZED (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS c
        FROM seq
        WHERE prev_type IS NOT NULL AND prev_type <> 'purchase'
        GROUP BY 1, 2
    ),
    trans AS MATERIALIZED (SELECT DISTINCT prev_type AS state FROM counts),
    q AS MATERIALIZED (
        SELECT prev_type, next_type,
               CAST(c AS DOUBLE)
                   / SUM(CAST(c AS DOUBLE)) OVER (PARTITION BY prev_type)
                   AS prob
        FROM counts
    ),
    t0 AS (SELECT state, CAST(0 AS DOUBLE) AS t FROM trans)"""
    steps = ",\n".join(
        f"""    t{k + 1} AS MATERIALIZED (
        SELECT s.state,
               1.0 + COALESCE(SUM(q.prob * v.t), 0.0) AS t
        FROM trans s
        LEFT JOIN q ON q.prev_type = s.state
                   AND q.next_type <> 'purchase'
        LEFT JOIN t{k} v ON v.state = q.next_type
        GROUP BY s.state
    )"""
        for k in range(_ABS_ITERS)
    )
    from healthcare_data_lakehouse_spark.functions import dround_sql as _ds

    return (
        head + ",\n" + steps + f"""
    SELECT state, {_ds("t", 4)} AS expected_steps_to_purchase
    FROM t{_ABS_ITERS} ORDER BY state
    """
    )


@register(
    "events_absorbing_markov_steps",
    oracle=_absorbing_oracle(),
    description="Expected number of events until the next PURCHASE from "
    "each behavioral state, via the absorbing-Markov-chain fundamental "
    "matrix: purchase is absorbing, Q is the transient-to-transient "
    "transition matrix from per-user lag pairs, and t = (I-Q)^-1 * 1 "
    "solved as the 40-term truncated Neumann iteration "
    "t_{{k+1}} = 1 + Q t_k — the same unrolled-CTE-vs-driver-numpy "
    "discipline as events_markov_stationary, truncation identical on "
    "both engines so the committed values agree bitwise (a chain with "
    "low purchase reachability simply shows the 40-step partial sum, "
    "still a valid 'expected events within horizon' read). Transition "
    "counting is the only data-scale pass (one lag window per user + "
    "one groupBy over 100 TB of events); the |event_types|^2 matrix is "
    "metadata scale and the iteration runs driver-side in numpy.",
)
def events_absorbing_markov_steps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull() & (F.col("prev_type") != "purchase")
    )
    counts = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # |event_types|^2 rows: metadata scale by construction
    )
    states = sorted({r.prev_type for r in counts})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    full = np.zeros((n, n + 1))  # extra col collects absorbing mass
    for r in counts:
        j = idx.get(r.next_type, n)
        full[idx[r.prev_type], j] = r.c
    row_tot = full.sum(axis=1, keepdims=True)
    probs = full / row_tot
    q = probs[:, :n]  # transient-to-transient only
    t = np.zeros(n)
    for _ in range(_ABS_ITERS):
        t = 1.0 + q @ t
    out = spark.createDataFrame(
        [(s, float(t[idx[s]])) for s in states],
        "state string, t double",
    )
    return out.select(
        "state", dround("t", 4).alias("expected_steps_to_purchase")
    ).orderBy("state")


# ----------------- SES smoothing-constant selection by in-sample SSE
_SES_ALPHAS = (0.1, 0.3, 0.5, 0.7, 0.9)


@register(
    "forecast_ses_alpha_grid",
    oracle=f"""
    WITH RECURSIVE monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(ROUND(CAST(o_totalprice * 100
                    AS DECIMAL(38,8)), 0) AS BIGINT)) AS DOUBLE) AS rev_c,
               ROW_NUMBER() OVER (
                   ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ) AS rn
        FROM orders GROUP BY 1
    ),
    alphas AS (
        SELECT CAST(UNNEST(
            [{", ".join(repr(a) for a in _SES_ALPHAS)}]
        ) AS DOUBLE) AS alpha
    ),
    ses AS (
        SELECT a.alpha, m.rn, m.rev_c AS s, CAST(0 AS DOUBLE) AS sse
        FROM monthly m, alphas a WHERE m.rn = 1
        UNION ALL
        SELECT h.alpha, m.rn,
               {dround_sql("h.alpha * m.rev_c", 0)}
                   + {dround_sql("(1.0 - h.alpha) * h.s", 0)},
               h.sse + {dround_sql("(m.rev_c - h.s) * (m.rev_c - h.s)", 0)}
        FROM ses h JOIN monthly m ON m.rn = h.rn + 1
    ),
    final AS (
        SELECT s.alpha,
               {dround_sql("sqrt(s.sse / (t.n - 1)) / 100.0", 4)} AS rmse
        FROM ses s, (SELECT MAX(rn) AS n FROM monthly) t
        WHERE s.rn = t.n
    ),
    best AS (SELECT MIN(rmse) AS best_rmse FROM final)
    SELECT f.alpha, f.rmse, f.rmse = b.best_rmse AS is_best
    FROM final f, best b ORDER BY f.alpha
    """,
    description="Smoothing-constant model selection for simple "
    "exponential smoothing: the alpha grid 0.1/0.3/0.5/0.7/0.9 is "
    "scored by in-sample one-step-ahead RMSE (dollars) over monthly "
    "order revenue (s_1 = y_1, error from t = 2) and the minimizer is "
    "flagged — the smallest honest version of the grid search every "
    "forecasting library runs before it ships an alpha. Float "
    "discipline earned the hard way (three failed cuts, all recorded "
    "in PERF_r13.md SS11): the raw `a*y + (1-a)*s` recurrence is an "
    "FMA-contraction site whose fused/unfused difference crossed a "
    "rounding boundary at step 13 of THIS series, so the state lives "
    "in INTEGER CENTS and each product is dround(0)-pinned separately "
    "(function calls block contraction; integer state makes every "
    "err^2 term and the SSE accumulation engine-exact). One agg "
    "shuffle collapses 100 TB to the month series; the 5 recurrences "
    "fold as one F.aggregate over (alpha x sorted months) at metadata "
    "scale, mirroring the oracle's multi-row recursive CTE.",
)
def forecast_ses_alpha_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(
        F.sum(
            F.round((F.col("o_totalprice") * 100).cast("decimal(38,8)"), 0)
            .cast("bigint")
        )
        .cast("double")
        .alias("rev_c")
    )
    series = monthly.agg(
        F.sort_array(F.collect_list(F.struct("month", "rev_c"))).alias("s")
    )
    grid = series.select(
        "s",
        F.explode(
            F.array(*[F.lit(a).cast("double") for a in _SES_ALPHAS])
        ).alias("alpha"),
    )

    def step(acc, x):
        first = acc["i"] == 0
        err = x["rev_c"] - acc["s"]
        # integer-cents state, each product dround(0)-pinned separately:
        # blocks FMA contraction and keeps s / err / err^2 engine-exact
        new_s = F.when(first, x["rev_c"]).otherwise(
            dround(F.col("alpha") * x["rev_c"], 0)
            + dround((1.0 - F.col("alpha")) * acc["s"], 0)
        )
        new_sse = F.when(first, F.lit(0.0)).otherwise(
            acc["sse"] + dround(err * err, 0)
        )
        return F.struct(
            new_s.alias("s"), new_sse.alias("sse"), (acc["i"] + 1).alias("i")
        )

    init = F.struct(
        F.lit(0.0).alias("s"), F.lit(0.0).alias("sse"), F.lit(0).alias("i")
    )
    n = series.select(F.size("s").alias("n"))
    scored = grid.select(
        "alpha",
        F.aggregate(F.col("s"), init, step)["sse"].alias("sse"),
    ).crossJoin(F.broadcast(n)).select(
        "alpha",
        dround(
            F.sqrt(F.col("sse") / (F.col("n") - 1)) / 100.0, 4
        ).alias("rmse"),
    )
    best = scored.agg(F.min("rmse").alias("best_rmse"))
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "alpha",
            "rmse",
            (F.col("rmse") == F.col("best_rmse")).alias("is_best"),
        )
        .orderBy("alpha")
    )


# -------------------- hierarchical forecast reconciliation (top-down)
@register(
    "forecast_hierarchical_topdown",
    oracle=f"""
    WITH mp AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               o_orderpriority AS priority,
               CAST(SUM(CAST(ROUND(CAST(o_totalprice * 100
                    AS DECIMAL(38,8)), 0) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    mm AS (SELECT MIN(month) AS minm, MAX(month) AS maxm FROM mp),
    monthly AS (
        SELECT month, CAST(SUM(cents) AS BIGINT) AS cents
        FROM mp GROUP BY 1
    ),
    idxed AS (
        SELECT CAST(datediff('month', mm.minm, m.month) AS BIGINT) AS x,
               m.cents AS y
        FROM monthly m, mm
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sx2,
               CAST(MAX(x) AS BIGINT) AS maxx
        FROM idxed
    ),
    fit AS (
        SELECT n, sx, sy, maxx,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx)
                   AS slope
        FROM mom
    ),
    fit2 AS (
        SELECT maxx, slope,
               (CAST(sy AS DOUBLE) - slope * sx) / n AS intercept
        FROM fit
    ),
    sh AS (
        SELECT mp.priority, CAST(SUM(mp.cents) AS BIGINT) AS sp
        FROM mp, mm
        WHERE mp.month >= (mm.maxm - INTERVAL 11 MONTH)
        GROUP BY 1
    ),
    sht AS (
        SELECT priority, sp,
               CAST(SUM(sp) OVER () AS BIGINT) AS stot
        FROM sh
    ),
    hz AS (SELECT CAST(u.h AS BIGINT) AS h FROM UNNEST([1, 2, 3]) AS u(h))
    SELECT CAST((mm.maxm + h * INTERVAL 1 MONTH) AS DATE)
               AS forecast_month,
           s.priority,
           {dround_sql("CAST(s.sp AS DOUBLE) / s.stot", 6)} AS share,
           {dround_sql(
               "(f.intercept + f.slope * (f.maxx + h)) / 100.0", 2)}
               AS total_forecast_usd,
           {dround_sql(
               "(f.intercept + f.slope * (f.maxx + h))"
               " * (CAST(s.sp AS DOUBLE) / s.stot) / 100.0", 2)}
               AS forecast_usd
    FROM hz, fit2 f, sht s, mm
    ORDER BY forecast_month, priority
    """,
    description="Hierarchical forecast reconciliation, top-down (the "
    "standard coherence strategy for forecasting at scale — fit ONE "
    "reliable aggregate model, allocate to the hierarchy by historical "
    "proportions, and every level sums to its parent by construction; "
    "Hyndman & Athanasopoulos FPP ch. 11): an exact-OLS linear trend on "
    "monthly TOTAL revenue (integer-cents moments, closed-form slope/"
    "intercept — deterministic on both engines) projects 3 months "
    "ahead; trailing-12-month revenue shares per order priority "
    "allocate each total. At 100 TB with 1M bottom-level series this "
    "shape is why top-down survives: the model fits on the day/month "
    "grain aggregate (one shuffle collapses the fact table), the "
    "allocation is a broadcast join of the |hierarchy|-row share "
    "table, and no per-series state is ever materialized. The share "
    "normalization is one window over the 5-row priority aggregate; "
    "month indexes derive from datediff (no ordered window).",
)
def forecast_hierarchical_topdown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    mp = orders.groupBy(
        F.trunc("o_orderdate", "month").alias("month"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.sum(
            F.round(
                (F.col("o_totalprice") * 100).cast("decimal(38,8)"), 0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    mm = mp.agg(
        F.min("month").alias("minm"), F.max("month").alias("maxm")
    )
    monthly = mp.groupBy("month").agg(
        F.sum("cents").cast("bigint").alias("cents")
    )
    idxed = monthly.crossJoin(F.broadcast(mm)).select(
        F.months_between(F.col("month"), F.col("minm"))
        .cast("bigint")
        .alias("x"),
        F.col("cents").alias("y"),
    )
    mom = idxed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.max("x").cast("bigint").alias("maxx"),
    )
    fit = mom.select(
        "n",
        "sx",
        "sy",
        "maxx",
        (
            (F.col("n").cast("double") * F.col("sxy")
             - F.col("sx").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("sx2")
               - F.col("sx").cast("double") * F.col("sx"))
        ).alias("slope"),
    )
    fit2 = fit.select(
        "maxx",
        "slope",
        (
            (F.col("sy").cast("double") - F.col("slope") * F.col("sx"))
            / F.col("n")
        ).alias("intercept"),
    )
    sh = (
        mp.crossJoin(F.broadcast(mm))
        .filter(F.col("month") >= F.add_months(F.col("maxm"), -11))
        .groupBy("priority")
        .agg(F.sum("cents").cast("bigint").alias("sp"))
    )
    sht = sh.select(
        "priority",
        "sp",
        F.sum("sp")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("stot"),
    )
    hz = spark.range(1, 4).select(F.col("id").cast("bigint").alias("h"))
    share = F.col("sp").cast("double") / F.col("stot")
    total_fc = F.col("intercept") + F.col("slope") * (
        F.col("maxx") + F.col("h")
    )
    return (
        hz.crossJoin(F.broadcast(fit2))
        .crossJoin(F.broadcast(sht))
        .crossJoin(F.broadcast(mm))
        .select(
            F.add_months(F.col("maxm"), F.col("h").cast("int"))
            .alias("forecast_month"),
            "priority",
            dround(share, 6).alias("share"),
            dround(total_fc / 100.0, 2).alias("total_forecast_usd"),
            dround(total_fc * share / 100.0, 2).alias("forecast_usd"),
        )
        .orderBy("forecast_month", "priority")
    )
