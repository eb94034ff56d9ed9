"""Structured Streaming module tests."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_stream_files_to_bronze(spark, sf_dir):
    from healthcare_data_lakehouse_spark.streaming.ingest import (
        stream_files_to_bronze,
    )

    work = tempfile.mkdtemp(prefix="stream_bronze_")
    src = os.path.join(work, "landing")
    os.makedirs(src)
    batch = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("grp")
    )
    batch.write.parquet(os.path.join(src, "batch1"))
    # file streams discover files, not nested dirs — point at the files
    q = stream_files_to_bronze(
        spark,
        os.path.join(src, "batch1"),
        batch.schema,
        os.path.join(work, "bronze"),
        os.path.join(work, "chk"),
    )
    q.awaitTermination()
    out = spark.read.parquet(os.path.join(work, "bronze"))
    assert out.count() == 100
    assert "_ingested_at" in out.columns


def test_streaming_window_counts_equal_batch(spark, sf_dir):
    from healthcare_data_lakehouse_spark.queries.catalog import load_all
    from healthcare_data_lakehouse_spark.streaming.ingest import (
        windowed_event_counts,
    )
    from healthcare_data_lakehouse_spark.tables import table

    streamed = load_all()["streaming_event_window_counts"].fn(spark, sf_dir)
    batch = windowed_event_counts(table(spark, sf_dir, "events"), window="1 hour")
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_stateful_user_totals_equal_batch(spark, sf_dir):
    from healthcare_data_lakehouse_spark.queries.catalog import load_all
    from healthcare_data_lakehouse_spark.tables import table

    streamed = load_all()["streaming_stateful_user_totals"].fn(spark, sf_dir)
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0
