"""Python DataSource: the reference's dict-record ingestion as a parallel
schema'd Spark source."""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F

from healthcare_data_lakehouse_spark.sources import register_records_source


def _land_jsonl(records) -> str:
    work = tempfile.mkdtemp(prefix="records_src_")
    path = os.path.join(work, "landing.jsonl")
    with open(path, "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    return path


def test_records_source_reads_ragged_dicts(spark):
    records = [
        {"id": "1", "patient_id": "MRN000000001", "age": 40,
         "heart_rate": 72.5, "diagnosis_code": "A01"},
        {"id": "2", "patient_id": None, "age": None,
         "diagnosis_code": "e11.9 ", "address": "N/A"},
        {"id": "3", "heart_rate": 500.0, "ssn": "  123-45-6789  "},
    ]
    register_records_source(spark)
    df = (
        spark.read.format("healthcare_records")
        .option("path", _land_jsonl(records))
        .option("numPartitions", 3)
        .load()
    )
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 3
    # declared schema applies; missing keys are NULL; ints coerce to double
    assert rows["1"].age == 40.0 and isinstance(rows["1"].age, float)
    assert rows["2"].patient_id is None and rows["2"].address == "N/A"
    assert rows["3"].heart_rate == 500.0 and rows["3"].birth_date is None
    # striped partitions: the scan parallelizes without a repartition
    assert df.rdd.getNumPartitions() == 3


def test_records_source_feeds_transform_pipeline(spark):
    """The custom source composes with the engine's operators like any
    built-in table: filter + uppercase-clean over the scanned records."""
    records = [
        {"id": str(i), "diagnosis_code": "e11.9 " if i % 2 else "A01",
         "age": 30 + i}
        for i in range(20)
    ]
    register_records_source(spark)
    df = (
        spark.read.format("healthcare_records")
        .option("path", _land_jsonl(records))
        .load()
    )
    cleaned = df.select(
        "id", F.upper(F.trim("diagnosis_code")).alias("diagnosis_code")
    ).filter(F.col("diagnosis_code") == "E11.9")
    assert cleaned.count() == 10
