"""LineageTracker graph-op tests (SURVEY.md §2.5 G1-G7)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from healthcare_data_lakehouse_spark.lineage import (
    LineageTracker,
    TransformationType,
)
from healthcare_data_lakehouse_spark.zones import DataZone


@pytest.fixture()
def tracker():
    return LineageTracker()


def chain(tracker):
    a = tracker.register_asset("raw", DataZone.LANDING, "/raw")
    b = tracker.register_asset("bronze", DataZone.BRONZE, "/bronze")
    c = tracker.register_asset("silver", DataZone.SILVER, "/silver")
    tracker.record_transformation(
        "ingest", TransformationType.INGESTION, [a.asset_id], b.asset_id
    )
    tracker.record_transformation(
        "clean", TransformationType.CLEANING, [b.asset_id], c.asset_id
    )
    return a, b, c


def test_asset_id_is_content_hash(tracker):
    a1 = tracker.register_asset("x", DataZone.BRONZE, "/x")
    a2 = tracker.register_asset("x", DataZone.BRONZE, "/elsewhere")
    assert a1.asset_id == a2.asset_id  # name:zone:version hash
    assert a1.asset_id.startswith("asset_")
    assert len(a1.asset_id) == len("asset_") + 16


def test_upstream_downstream(tracker):
    a, b, c = chain(tracker)
    assert tracker.get_upstream_lineage(c.asset_id) == [b.asset_id, a.asset_id]
    assert tracker.get_downstream_impact(a.asset_id) == [b.asset_id, c.asset_id]
    assert tracker.get_upstream_lineage(a.asset_id) == []


def test_max_depth(tracker):
    a, b, c = chain(tracker)
    assert tracker.get_upstream_lineage(c.asset_id, max_depth=0) == [b.asset_id]


def test_lineage_report(tracker):
    a, b, c = chain(tracker)
    report = tracker.generate_lineage_report(c.asset_id)
    assert report["upstream_lineage"]["count"] == 2
    assert report["downstream_impact"]["count"] == 0
    assert set(report["data_zones_traversed"]) == {"landing", "bronze", "silver"}
    with pytest.raises(ValueError, match="Asset not found"):
        tracker.generate_lineage_report("nope")


def test_pipeline_runs_and_audit_export(tracker):
    run = tracker.start_pipeline_run("p", triggered_by="test")
    a = tracker.register_asset("in", DataZone.LANDING, "/in")
    b = tracker.register_asset("out", DataZone.BRONZE, "/out")
    tracker.record_transformation(
        "s1", TransformationType.INGESTION, [a.asset_id], b.asset_id,
        pipeline_run_id=run.run_id,
    )
    done = tracker.complete_pipeline_run(run.run_id, status="success")
    assert done.completed_at is not None
    assert len(done.steps) == 1

    export = tracker.export_for_audit()
    assert export["summary"]["total_assets"] == 2
    assert export["summary"]["total_pipeline_runs"] == 1
    assert export["summary"]["total_transformations"] == 1

    future = datetime.now(timezone.utc) + timedelta(days=1)
    empty = tracker.export_for_audit(start_date=future)
    assert empty["summary"]["total_assets"] == 0

    with pytest.raises(ValueError, match="Pipeline run not found"):
        tracker.complete_pipeline_run("nope")


def test_column_lineage_from_plan(spark):
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_spark.plan_lineage import (
        column_lineage_from_plan,
    )

    a = spark.createDataFrame([(1, 2.0, "x")], "k int, v double, s string")
    b = spark.createDataFrame([(1, 5.0)], "k int, w double")
    df = (
        a.join(b, "k")
        .groupBy(F.col("s").alias("grp"))
        .agg(
            F.round(F.sum(F.col("v") * F.col("w")), 2).alias("vw"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    lin = column_lineage_from_plan(df)
    assert lin["grp"] == ["s"]
    assert lin["vw"] == ["v", "w"]  # both join sides traced through
    assert lin["n"] == []           # literal-only aggregate: no sources

    # pass-through shapes (filter on top) resolve to identity
    flt = a.filter(F.col("v") > 0)
    assert column_lineage_from_plan(flt)["s"] == ["s"]
