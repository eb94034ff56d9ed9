"""Query catalog: every entry pairs a Spark DataFrame builder with an
ANSI-SQL oracle (run by DuckDB over the same parquet) per the driver
contract in ``__spark_entry__.py``."""

from healthcare_data_lakehouse_spark.queries.catalog import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
