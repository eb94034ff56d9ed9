"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` single-JVM; the config block is written for
a real multi-executor cluster (AQE, skew handling, broadcast thresholds) and
degrades gracefully on local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "healthcare-data-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    Defaults favor the 100 TB design point: AQE on (runtime coalescing +
    skew-join splitting), partial aggregation pushdown, and Arrow for any
    pandas interchange. ``shuffle_partitions`` defaults to the local core
    count for tests; a real cluster deployment overrides it (rule of thumb:
    2-3x total executor cores, or rely on AQE coalescing from a high
    initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if master.startswith("local") else 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime shuffle-partition coalescing, skew-join
        # splitting, and dynamic join-strategy switching. Essential at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / toPandas interchange (the sanctioned
        # Python boundary; row-at-a-time Python UDFs are banned in hot paths).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Null-on-unparseable date semantics to mirror the reference's
        # try/except ValueError parse fallthrough (etl_manager.py:513-519).
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # Broadcast small dimension tables automatically.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stdout clean (bench.py's one-JSON-line contract)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
