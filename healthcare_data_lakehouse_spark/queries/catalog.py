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


def load_all() -> dict[str, QuerySpec]:
    """Import every query submodule so registrations run."""
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

    return QUERIES
