"""healthcare_data_lakehouse_spark — a PySpark-native analytics engine.

A brand-new implementation of the query / data-processing capabilities of
the reference `cmangun/healthcare-data-lakehouse` (a pure-Python, in-memory
medallion ETL + data-quality + lineage demo), re-expressed Spark-first:

- medallion zones backed by partitioned Parquet tables (the reference's
  in-memory ``dict[DataZone, dict[str, list[dict]]]`` stand-in,
  reference ``src/etl/etl_manager.py:156-160``),
- the six standard record transforms as Catalyst Column expressions
  (reference ``src/etl/etl_manager.py:162-199``),
- the eight healthcare data-quality rules as a single fused aggregation
  pass (reference ``src/quality/data_quality.py:214-303``),
- the ETL job state machine with quarantine split
  (reference ``src/etl/etl_manager.py:206-356``),
- the lineage tracker graph (reference ``src/lineage/lineage_tracker.py``),
- plus large-scale training-data-pipeline operators (dedup families,
  similarity search, text analysis, multimodal column plumbing) that the
  100 TB north star requires.

Everything is DataFrame/Spark-SQL declarative so Catalyst/Tungsten pick the
physical plan; Python UDFs appear only as Arrow-batched pandas UDFs on the
explicitly-marked slow paths.
"""

from healthcare_data_lakehouse_spark.zones import DataZone, ZoneStore
from healthcare_data_lakehouse_spark.lineage import LineageTracker

__all__ = ["DataZone", "ZoneStore", "LineageTracker"]
__version__ = "0.1.0"
