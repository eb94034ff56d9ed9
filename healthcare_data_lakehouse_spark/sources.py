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

__all__ = [
    "read_source",
    "write_sink",
    "SUPPORTED_FORMATS",
    "RecordsDataSource",
    "register_records_source",
    "DEFAULT_RECORD_SCHEMA",
]

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc", "xml")


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
    if fmt == "xml":
        # Spark 4's built-in XML datasource (the spark-xml merge): one
        # row element per record, same explicit-schema discipline as
        # csv/json
        reader = reader.option("rowTag", "row")
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
    if fmt == "xml":
        writer = writer.option("rowTag", "row")
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)


# --------------------------------------------------------------------------
# Python DataSource: in-memory/landed dict records as a first-class source.
#
# The reference's ONLY ingestion path is a Python list of dicts handed to
# ``HealthcareETLManager.run_job(config, source_records)`` (reference
# ``src/etl/etl_manager.py:156-160``). Spark 4's Python DataSource API turns
# that exact record shape (JSONL-landed dicts, ragged keys, mixed types)
# into a parallel, schema'd scan: partitions stripe the file, each executor
# parses only its stripe, and every downstream operator (transforms,
# quality, loads) consumes it like any other table. At 100 TB the same
# class points at an object-store prefix with one partition per file.

DEFAULT_RECORD_SCHEMA = (
    "id string, patient_id string, birth_date string, admission_date string, "
    "age double, heart_rate double, diagnosis_code string, patient_name string, "
    "ssn string, address string"
)


def _coerce(value, spark_type_name: str):
    if value is None:
        return None
    if spark_type_name == "double":
        return float(value)
    if spark_type_name in ("integer", "long"):
        return int(value)
    if spark_type_name == "string" and not isinstance(value, str):
        return str(value)
    return value


try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RecordsReader(DataSourceReader):
        def __init__(self, schema, options):
            self.fields = [(f.name, f.dataType.typeName()) for f in schema.fields]
            self.path = options["path"]
            self.n_parts = int(options.get("numpartitions", 4))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            import json as _json

            stripe = partition.value
            with open(self.path) as fh:
                for lineno, line in enumerate(fh):
                    if lineno % self.n_parts != stripe or not line.strip():
                        continue
                    rec = _json.loads(line)
                    yield tuple(
                        _coerce(rec.get(name), t) for name, t in self.fields
                    )

    class RecordsDataSource(DataSource):
        """``spark.read.format("healthcare_records")`` — dict-record JSONL
        source with striped partitions (reference run_job ingestion made
        distributed). Options: ``path`` (JSONL file), ``numPartitions``."""

        @classmethod
        def name(cls) -> str:
            return "healthcare_records"

        def schema(self) -> str:
            return DEFAULT_RECORD_SCHEMA

        def reader(self, schema):
            return _RecordsReader(schema, self.options)

    def register_records_source(spark: SparkSession) -> None:
        spark.dataSource.register(RecordsDataSource)

except ImportError:  # pragma: no cover - pyspark < 4 fallback
    RecordsDataSource = None  # type: ignore[assignment]

    def register_records_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "Python DataSource API requires pyspark >= 4.0"
        )
