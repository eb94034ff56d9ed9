"""Loaders for the driver-provided parquet tables (TESTDATA.md).

``load`` returns a dict of DataFrames; reads stay lazy so downstream filters
and projections push into the Parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to a session-tz TIMESTAMP.

    The fixture has shipped ``ts`` as bigint nanos (via ``nanosAsLong``) and
    as TIMESTAMP_NTZ across driver rounds; both are relabeled to TIMESTAMP.
    With the session timezone pinned to UTC the NTZ cast preserves the
    wall-clock value exactly, matching DuckDB's naive TIMESTAMP. Works on
    batch and streaming DataFrames alike (pure projection, no shuffle).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    The ``events`` fixture's ``ts`` column has shipped in two physical forms:
    Parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects, so we
    read raw nanos via ``nanosAsLong`` and floor-div to micros — the same
    truncation DuckDB applies), and TIMESTAMP_NTZ. Normalize both to a plain
    session-tz TIMESTAMP: the session timezone is pinned to UTC
    (``session.py``), so an NTZ→TZ cast is a pure type relabel with identical
    wall-clock semantics to DuckDB's naive TIMESTAMP.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
