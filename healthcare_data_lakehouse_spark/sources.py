"""External-format sources and sinks.

The reference names "parquet, delta, csv, etc." only as asset metadata
(reference ``src/lineage/lineage_tracker.py:70`` — no reader/writer exists);
here they are real, thin wrappers over Spark's built-in connectors with the
engine's conventions baked in:

* **Explicit schema always** — schema inference reads the data twice and
  guesses; at 100 TB both are unacceptable. Callers pass a ``StructType``
  (or reuse a fixture schema).
* **Permissive-by-default CSV/JSON** with a ``_corrupt_record`` capture
  column when requested — malformed rows land in quarantine, not in a job
  failure (mirrors the engine's quarantine philosophy).
* **Partitioned writes** — ``partition_by`` maps to ``write.partitionBy``
  for partition-pruned downstream reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_source", "write_sink", "SUPPORTED_FORMATS"]

SUPPORTED_FORMATS = ("parquet", "csv", "json")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an explicit schema.

    CSV defaults: header on, ISO timestamps. JSON/CSV default to PERMISSIVE
    mode (bad records null out rather than failing the job); pass
    ``options={"mode": "FAILFAST"}`` for strict ingestion.
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported source format: {fmt!r}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df`` to ``path`` as ``fmt``; ``partition_by`` yields
    partition-pruned layouts for downstream scans."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported sink format: {fmt!r}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)
