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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    The ``events`` fixture stores ``ts`` as Parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects outright; read it as raw nanos
    (``nanosAsLong``) and convert to a microsecond timestamp (floor-div, the
    same truncation DuckDB applies when reading ns parquet into its us
    TIMESTAMP).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def load(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
