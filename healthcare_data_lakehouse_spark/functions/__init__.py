"""Shared column helpers for the query catalog."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 2) -> Column:
    """Round a double exactly, via decimal, returning double.

    ``ROUND(double)`` is half-up on the *binary* value, so a quantity whose
    decimal rendering lands on ``.xx5`` can round differently across engines
    (Spark vs DuckDB disagree on e.g. 251483.295 -> .29 vs .3). Routing
    through ``DECIMAL(38,8)`` makes the rounding exact and deterministic:
    double -> decimal is round-half-up to 8 places in both engines, decimal
    rounding is exact, and the final cast back to double is lossless for
    values this small. Oracle-side equivalent:
    ``CAST(ROUND(CAST(x AS DECIMAL(38,8)), n) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("decimal(38,8)"), scale).cast("double")


def dround_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-oracle twin of :func:`dround` (string SQL fragment)."""
    return f"CAST(ROUND(CAST(({expr}) AS DECIMAL(38,8)), {scale}) AS DOUBLE)"
