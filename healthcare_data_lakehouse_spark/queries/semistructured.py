"""Semi-structured & array surface: VARIANT JSON, UNPIVOT/melt, pure
higher-order-function array analytics.

The reference stores free-form JSON per record (reference
``src/lineage/lineage_tracker.py:160-169`` metadata dicts,
``src/quality/data_quality.py`` check params) but only round-trips it;
here the engine *queries* it. Spark 4's VARIANT type gives binary-parsed
JSON access without a fixed schema — the lakehouse answer to
schema-on-read columns.

Scale notes (100 TB design point):
* ``parse_json`` happens once per row in the scan stage and
  ``variant_get`` is codegen'd — no Python, no regex, no per-query
  re-parse of the same blob.
* The HOF query never explodes: token stats compute inside the array
  column (one row in, one row out), so a 10k-token document costs zero
  shuffle rows. Explode-then-agg (see ``text_token_stats``) is only for
  corpus-wide rollups.
* ``unpivot`` is a zero-shuffle Expand over an already-aggregated
  frame — melt AFTER the group-by, never before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_lakehouse_spark.queries.catalog import register
from healthcare_data_lakehouse_spark.tables import table

__all__: list[str] = []


# ----------------------------------------------------------- VARIANT JSON
@register(
    "events_props_variant_stats",
    oracle="""
    SELECT event_type, COUNT(k) AS n_with_k,
           ROUND(AVG(k), 4) AS avg_k,
           MIN(k) AS min_k, MAX(k) AS max_k
    FROM (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
    description="Schema-on-read JSON stats via Spark 4 VARIANT: "
    "parse_json once in the scan, try_variant_get codegen'd extraction "
    "— no Python UDF, no per-query regex.",
)
def events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ------------------------------------------------------------ UNPIVOT/melt
@register(
    "unpivot_lineitem_metrics",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS sum_disc_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_base_price', sum_base_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc_price', sum_disc_price FROM agg
    """,
    description="Wide-to-long melt (inverse of the PIVOT query): "
    "aggregate first, then unpivot the 3-metric frame — the Expand "
    "touches |flags| x 3 rows, not the fact table.",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "sum_disc_price"],
        "metric",
        "value",
    )


# ----------------------------------------- pure-HOF array analytics
@register(
    "text_array_stats_hof",
    oracle="""
    SELECT doc_id, len(toks) AS n_tokens,
           ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0
                 / len(toks), 4) AS avg_token_len,
           list_max(list_transform(toks, x -> length(x))) AS max_token_len
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    WHERE len(toks) > 0
    """,
    description="Per-document token statistics computed entirely inside "
    "the array column (filter/transform/aggregate higher-order "
    "functions): one row in, one row out, zero explode — a 10k-token "
    "document adds no shuffle rows.",
)
def text_array_stats_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("toks"),
    ).filter(F.size("toks") > 0)
    total_len = F.aggregate(
        F.col("toks"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    return with_toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.round(total_len / F.size("toks"), 4).alias("avg_token_len"),
        F.array_max(F.transform("toks", lambda x: F.length(x))).alias(
            "max_token_len"
        ),
    )
