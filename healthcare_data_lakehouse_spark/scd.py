"""Slowly-changing-dimension (type 2) versioning over zone tables.

The reference's MERGE load (``src/etl/etl_manager.py:456-467``) overwrites
matched rows in place — history is lost. SCD2 keeps it: every change closes
the current version (``valid_to_batch``, ``is_current=false``) and inserts
a successor (``version+1``). Audit-critical for healthcare dimensions
(patient demographics, provider registries).

Batch ids, not wall-clock timestamps, stamp validity ranges — deterministic
under replay and oracle-comparable; a deployment maps batch id to the
pipeline-run watermark.

Scale shape: one equi-join of the incoming batch against CURRENT rows only
(history is never rescanned), null-safe change detection on the tracked
columns, then a union of four disjoint row sets. On Delta this is exactly
``MERGE INTO … WHEN MATCHED AND <changed> THEN UPDATE (close) … WHEN NOT
MATCHED THEN INSERT`` plus an insert of successor rows; the join/shuffle
count is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_initial", "scd2_merge"]

_META = ["version", "valid_from_batch", "valid_to_batch", "is_current"]


def scd2_initial(df: DataFrame, batch_id: int = 0) -> DataFrame:
    """Version-stamp an initial dimension load (everything v1, open)."""
    return (
        df.withColumn("version", F.lit(1).cast("bigint"))
        .withColumn("valid_from_batch", F.lit(batch_id).cast("bigint"))
        .withColumn("valid_to_batch", F.lit(None).cast("bigint"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    dim: DataFrame,
    incoming: DataFrame,
    key: str,
    batch_id: int,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Apply an incoming (CDC-style, partial) batch to an SCD2 dimension.

    * unchanged incoming rows are no-ops (null-safe comparison on
      ``compare_cols``, default: every non-key incoming column);
    * changed rows close the current version and insert ``version+1``;
    * unseen keys insert as version 1.
    """
    attrs = [c for c in incoming.columns if c != key]
    compare_cols = compare_cols or attrs
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    j = incoming.alias("i").join(
        cur.alias("c"), F.col(f"i.{key}") == F.col(f"c.{key}"), "left"
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"i.{c}").eqNullSafe(F.col(f"c.{c}"))
    is_new = F.col(f"c.{key}").isNull()

    inserts = j.filter(is_new | changed).select(
        *[F.col(f"i.{c}") for c in incoming.columns],
        F.coalesce(F.col("c.version") + 1, F.lit(1)).cast("bigint").alias("version"),
        F.lit(batch_id).cast("bigint").alias("valid_from_batch"),
        F.lit(None).cast("bigint").alias("valid_to_batch"),
        F.lit(True).alias("is_current"),
    )
    changed_keys = j.filter((~is_new) & changed).select(
        F.col(f"i.{key}").alias("_k")
    )
    closing = (
        cur.join(changed_keys, cur[key] == F.col("_k"), "left_semi")
        .withColumn("valid_to_batch", F.lit(batch_id).cast("bigint"))
        .withColumn("is_current", F.lit(False))
    )
    untouched = cur.join(changed_keys, cur[key] == F.col("_k"), "left_anti")
    return (
        hist.unionByName(untouched).unionByName(closing).unionByName(inserts)
    )
