"""Structured Streaming ingestion into the medallion zones.

The reference is batch-only (SURVEY.md §2.7 — no streaming exists), so this
module is the engine's scale extension, not parity work: a landing-zone
file watcher that incrementally ingests into Bronze, and watermarked
event-time aggregation for streaming Gold marts.

Design for scale:
* File-source streaming (``maxFilesPerTrigger``) gives incremental,
  exactly-once ingestion with checkpointing — the pattern for continuous
  100 TB feeds.
* ``Trigger.AvailableNow`` drains the backlog then stops, which is also
  how tests execute deterministically.
* Watermarks bound state for late data; tumbling windows aggregate
  event-time KPIs with state cleanup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["stream_files_to_bronze", "windowed_event_counts", "run_stream_to_table"]


def stream_files_to_bronze(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    bronze_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 100,
):
    """Incrementally ingest files landing in ``source_dir`` into a Bronze
    parquet table. Returns the started StreamingQuery (AvailableNow —
    drains the current backlog and stops; swap the trigger for a
    continuous deployment)."""
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    stamped = reader.withColumn("_ingested_at", F.current_timestamp())
    return (
        stamped.writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window KPIs per event_type.

    On a stream, the watermark bounds aggregation state (late rows beyond
    it are dropped); the same plan runs unchanged on a batch frame.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_table(
    spark: SparkSession,
    source_parquet: str,
    work_dir: str,
    window: str = "1 hour",
    prepare=None,
    query_name: str = "stream_result",
) -> DataFrame:
    """Execute the windowed-count pipeline AS A STREAM over a bounded
    parquet source (AvailableNow) and return the materialized result.

    Deterministic harness for tests and oracle compares: the stream drains
    completely, so the final table equals the batch answer over the same
    input. Complete output mode + memory sink so no window is withheld
    behind the watermark at end-of-stream (a bounded-drain artifact; a
    continuous deployment uses append mode + a file/Kafka sink).

    ``prepare`` optionally rewrites the raw stream DataFrame (e.g. the
    events fixture needs its nanosecond ts converted) before aggregation.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(source_parquet).schema
    src_dir = source_parquet if os.path.isdir(source_parquet) else None
    if src_dir is None:
        # file-source streams need a directory
        src_dir = os.path.join(work_dir, "src")
        os.makedirs(src_dir, exist_ok=True)
        os.symlink(
            os.path.abspath(source_parquet),
            os.path.join(src_dir, os.path.basename(source_parquet)),
        )
    stream = spark.readStream.schema(schema).parquet(src_dir)
    if prepare is not None:
        stream = prepare(stream)
    out = windowed_event_counts(stream, window=window)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option(
            "checkpointLocation", os.path.join(work_dir, "chk")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
