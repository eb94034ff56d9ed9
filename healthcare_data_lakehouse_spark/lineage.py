"""Data lineage tracking (G1-G7, reference ``src/lineage/lineage_tracker.py``).

Lineage is metadata-scale (thousands of assets, not terabytes), so the graph
lives driver-side exactly as in the reference; optionally every asset /
transformation / run event is also appended to Parquet audit tables under a
``_lineage/`` prefix so a 1000-executor deployment can query provenance with
plain Spark SQL (``spark.read.parquet(.../_lineage/edges)``).

The reference's ETL manager calls a lineage API that doesn't exist
(``create_node`` / ``record_transformation(source_nodes=…)``,
``src/etl/etl_manager.py:404,425`` — SURVEY.md header notes 1-5). We
implement the *real* API the tracker defines: ``register_asset``
(``lineage_tracker.py:238-269``) and ``record_transformation``
(``lineage_tracker.py:271-337``).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections import defaultdict
from dataclasses import dataclass, field as dc_field, fields as dc_fields, is_dataclass
from datetime import datetime, timezone
from enum import Enum
from typing import Any

from healthcare_data_lakehouse_spark.zones import DataZone

__all__ = [
    "TransformationType",
    "DataAsset",
    "ColumnLineage",
    "DataQualityCheck",
    "TransformationStep",
    "PipelineRun",
    "LineageConfig",
    "LineageTracker",
]


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


def _jsonable(value: Any) -> Any:
    """Recursively coerce a dataclass tree into JSON-ready primitives:
    enums to their value, datetimes to ISO-8601, nested dataclasses /
    lists / dicts walked in place. One serializer instead of a hand-rolled
    dict literal per class keeps field coverage mechanical — adding a
    dataclass field automatically lands in the audit record."""
    if is_dataclass(value) and not isinstance(value, type):
        return {
            f.name: _jsonable(getattr(value, f.name)) for f in dc_fields(value)
        }
    if isinstance(value, Enum):
        return value.value
    if isinstance(value, datetime):
        return value.isoformat()
    if isinstance(value, list):
        return [_jsonable(v) for v in value]
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    return value


class TransformationType(str, Enum):
    """Reference ``lineage_tracker.py:38-51``."""

    INGESTION = "ingestion"
    CLEANING = "cleaning"
    DEDUPLICATION = "deduplication"
    STANDARDIZATION = "standardization"
    AGGREGATION = "aggregation"
    JOINING = "joining"
    FILTERING = "filtering"
    ENRICHMENT = "enrichment"
    ANONYMIZATION = "anonymization"
    FEATURE_ENGINEERING = "feature_engineering"


@dataclass
class DataAsset:
    """Reference ``lineage_tracker.py:62-93``."""

    asset_id: str
    name: str
    zone: DataZone
    location: str
    format: str
    schema_version: str
    row_count: int | None = None
    column_count: int | None = None
    size_bytes: int | None = None
    created_at: datetime = dc_field(default_factory=_utcnow)
    created_by: str = "system"
    tags: dict[str, str] = dc_field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return _jsonable(self)


@dataclass
class ColumnLineage:
    """Reference ``lineage_tracker.py:96-113``."""

    target_column: str
    source_columns: list[tuple[str, str]]  # (asset_id, column_name)
    transformation: str
    logic: str | None = None

    def to_dict(self) -> dict[str, Any]:
        d = _jsonable(self)
        # pair tuples carry no field names; spell them out for the record
        d["source_columns"] = [
            {"asset_id": a, "column": c} for a, c in self.source_columns
        ]
        return d


@dataclass
class DataQualityCheck:
    """Reference ``lineage_tracker.py:116-139``."""

    check_id: str
    check_name: str
    check_type: str
    status: str
    expected_value: Any
    actual_value: Any
    threshold: float | None = None
    error_message: str | None = None

    def to_dict(self) -> dict[str, Any]:
        return _jsonable(self)


@dataclass
class TransformationStep:
    """Reference ``lineage_tracker.py:142-177``."""

    step_id: str
    step_name: str
    transformation_type: TransformationType
    input_assets: list[str]
    output_asset: str
    column_lineage: list[ColumnLineage]
    quality_checks: list[DataQualityCheck]
    started_at: datetime
    completed_at: datetime
    duration_seconds: float
    records_processed: int
    records_output: int
    error: str | None = None
    parameters: dict[str, Any] = dc_field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        d = _jsonable(self)
        d["column_lineage"] = [c.to_dict() for c in self.column_lineage]
        return d


@dataclass
class PipelineRun:
    """Reference ``lineage_tracker.py:180-205``."""

    run_id: str
    pipeline_name: str
    pipeline_version: str
    steps: list[TransformationStep]
    started_at: datetime
    completed_at: datetime | None = None
    status: str = "running"
    triggered_by: str = "schedule"
    error: str | None = None

    def to_dict(self) -> dict[str, Any]:
        d = _jsonable(self)
        d["steps"] = [s.to_dict() for s in self.steps]
        return d


@dataclass
class LineageConfig:
    """Reference ``lineage_tracker.py:208-216`` (pydantic there; plain
    dataclass here — pydantic isn't a dependency of this engine)."""

    enable_column_lineage: bool = True
    enable_quality_checks: bool = True
    retention_days: int = 2555  # 7 years for HIPAA
    hash_sensitive_values: bool = True
    track_row_counts: bool = True
    #: Optional directory for JSONL audit persistence (assets/steps/runs
    #: appended as events; Spark-readable via spark.read.json).
    audit_dir: str | None = None


class LineageTracker:
    """Driver-side lineage graph with optional audit-log persistence
    (G1-G7, reference ``lineage_tracker.py:218-545``)."""

    def __init__(self, config: LineageConfig | None = None):
        self.config = config or LineageConfig()
        self._assets: dict[str, DataAsset] = {}
        self._pipeline_runs: dict[str, PipelineRun] = {}
        self._lineage_graph: dict[str, set[str]] = defaultdict(set)  # downstream
        self._reverse_graph: dict[str, set[str]] = defaultdict(set)  # upstream
        if self.config.audit_dir:
            os.makedirs(self.config.audit_dir, exist_ok=True)

    def _audit(self, kind: str, payload: dict[str, Any]) -> None:
        if not self.config.audit_dir:
            return
        with open(os.path.join(self.config.audit_dir, f"{kind}.jsonl"), "a") as f:
            f.write(json.dumps(payload, default=str) + "\n")

    # G1 ------------------------------------------------------------------
    def register_asset(
        self,
        name: str,
        zone: DataZone,
        location: str,
        format: str = "parquet",
        schema_version: str = "1.0.0",
        **kwargs: Any,
    ) -> DataAsset:
        """Content-hash id ``asset_{sha256(name:zone:version)[:16]}``
        (reference ``lineage_tracker.py:238-269,537-545``)."""
        asset_id = self._generate_asset_id(name, zone, schema_version)
        asset = DataAsset(
            asset_id=asset_id,
            name=name,
            zone=zone,
            location=location,
            format=format,
            schema_version=schema_version,
            **kwargs,
        )
        self._assets[asset_id] = asset
        self._audit("assets", asset.to_dict())
        return asset

    # G2 ------------------------------------------------------------------
    def record_transformation(
        self,
        step_name: str,
        transformation_type: TransformationType,
        input_asset_ids: list[str],
        output_asset_id: str,
        column_lineage: list[ColumnLineage] | None = None,
        quality_checks: list[DataQualityCheck] | None = None,
        records_processed: int = 0,
        records_output: int = 0,
        parameters: dict[str, Any] | None = None,
        pipeline_run_id: str | None = None,
    ) -> TransformationStep:
        """Reference ``lineage_tracker.py:271-337``."""
        now = _utcnow()
        step = TransformationStep(
            step_id=str(uuid.uuid4()),
            step_name=step_name,
            transformation_type=transformation_type,
            input_assets=input_asset_ids,
            output_asset=output_asset_id,
            column_lineage=column_lineage or [],
            quality_checks=quality_checks or [],
            started_at=now,
            completed_at=now,
            duration_seconds=0,
            records_processed=records_processed,
            records_output=records_output,
            parameters=parameters or {},
        )
        for input_id in input_asset_ids:
            self._lineage_graph[input_id].add(output_asset_id)
            self._reverse_graph[output_asset_id].add(input_id)
        if pipeline_run_id and pipeline_run_id in self._pipeline_runs:
            self._pipeline_runs[pipeline_run_id].steps.append(step)
        self._audit("steps", step.to_dict())
        return step

    # G3 ------------------------------------------------------------------
    def start_pipeline_run(
        self,
        pipeline_name: str,
        pipeline_version: str = "1.0.0",
        triggered_by: str = "schedule",
    ) -> PipelineRun:
        run = PipelineRun(
            run_id=str(uuid.uuid4()),
            pipeline_name=pipeline_name,
            pipeline_version=pipeline_version,
            steps=[],
            started_at=_utcnow(),
            triggered_by=triggered_by,
        )
        self._pipeline_runs[run.run_id] = run
        return run

    def complete_pipeline_run(
        self,
        run_id: str,
        status: str = "success",
        error: str | None = None,
    ) -> PipelineRun:
        run = self._pipeline_runs.get(run_id)
        if not run:
            raise ValueError(f"Pipeline run not found: {run_id}")
        run.completed_at = _utcnow()
        run.status = status
        run.error = error
        self._audit("runs", run.to_dict())
        return run

    # G4/G5 ----------------------------------------------------------------
    def get_upstream_lineage(self, asset_id: str, max_depth: int = 10) -> list[str]:
        """DFS over the reverse graph in discovery order; ids are appended
        per-edge before the visited check, so an asset reachable via two
        edges appears twice — reference quirk preserved
        (``lineage_tracker.py:407-418``)."""
        return self._traverse(asset_id, self._reverse_graph, max_depth)

    def get_downstream_impact(self, asset_id: str, max_depth: int = 10) -> list[str]:
        """Symmetric DFS over the downstream graph
        (``lineage_tracker.py:420-449``)."""
        return self._traverse(asset_id, self._lineage_graph, max_depth)

    def _traverse(
        self, asset_id: str, graph: dict[str, set[str]], max_depth: int
    ) -> list[str]:
        visited: set[str] = set()
        result: list[str] = []

        def go(current: str, depth: int) -> None:
            if depth > max_depth or current in visited:
                return
            visited.add(current)
            for nxt in graph.get(current, []):
                result.append(nxt)
                go(nxt, depth + 1)

        go(asset_id, 0)
        return result

    # G6 ------------------------------------------------------------------
    def generate_lineage_report(self, asset_id: str) -> dict[str, Any]:
        """Reference ``lineage_tracker.py:451-497``."""
        asset = self._assets.get(asset_id)
        if not asset:
            raise ValueError(f"Asset not found: {asset_id}")
        upstream = self.get_upstream_lineage(asset_id)
        downstream = self.get_downstream_impact(asset_id)
        return {
            "report_generated_at": _utcnow().isoformat(),
            "asset": asset.to_dict(),
            "upstream_lineage": {
                "count": len(upstream),
                "assets": [
                    self._assets[u].to_dict() for u in upstream if u in self._assets
                ],
            },
            "downstream_impact": {
                "count": len(downstream),
                "assets": [
                    self._assets[d].to_dict() for d in downstream if d in self._assets
                ],
            },
            "data_zones_traversed": list({
                self._assets[a].zone.value
                for a in upstream + downstream + [asset_id]
                if a in self._assets
            }),
        }

    # G7 ------------------------------------------------------------------
    def export_for_audit(
        self,
        start_date: datetime | None = None,
        end_date: datetime | None = None,
    ) -> dict[str, Any]:
        """Reference ``lineage_tracker.py:499-535``."""
        assets = list(self._assets.values())
        runs = list(self._pipeline_runs.values())
        if start_date:
            assets = [a for a in assets if a.created_at >= start_date]
            runs = [r for r in runs if r.started_at >= start_date]
        if end_date:
            assets = [a for a in assets if a.created_at <= end_date]
            runs = [r for r in runs if r.started_at <= end_date]
        return {
            "export_timestamp": _utcnow().isoformat(),
            "date_range": {
                "start": start_date.isoformat() if start_date else None,
                "end": end_date.isoformat() if end_date else None,
            },
            "summary": {
                "total_assets": len(assets),
                "total_pipeline_runs": len(runs),
                "total_transformations": sum(len(r.steps) for r in runs),
            },
            "assets": [a.to_dict() for a in assets],
            "pipeline_runs": [r.to_dict() for r in runs],
        }

    def _generate_asset_id(
        self, name: str, zone: DataZone, schema_version: str
    ) -> str:
        content = f"{name}:{zone.value}:{schema_version}"
        return f"asset_{hashlib.sha256(content.encode()).hexdigest()[:16]}"
