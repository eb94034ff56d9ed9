"""Standard record transforms as Catalyst Column-expression pipelines.

The reference registers six ``list[dict] -> list[dict]`` transforms
(``src/etl/etl_manager.py:162-199``) and applies them sequentially in config
order, silently skipping unknown names (``src/etl/etl_manager.py:253-262``).
Each is re-expressed here as a pure DataFrame -> DataFrame function built
from built-in ``pyspark.sql.functions`` only — every transform stays inside
whole-stage codegen; there are no Python UDFs on this path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = [
    "TransformSpec",
    "TransformRegistry",
    "deduplicate",
    "standardize_dates",
    "uppercase_codes",
    "trim_strings",
    "null_handling",
    "add_metadata",
    "standard_registry",
    "python_record_transform",
    "DATE_FIELDS",
    "DATE_FORMATS",
    "CODE_FIELDS",
    "NULL_SENTINELS",
    "INGEST_ORDER_COL",
]

#: Engine-added ingestion-order column. The reference's first-wins dedup is
#: order-dependent over a Python list (``etl_manager.py:482-496``); Spark
#: DataFrames are unordered, so ingestion stamps a monotonic order column
#: that dedup (and nothing else) consults.
INGEST_ORDER_COL = "_ingest_order"

#: T2 targets (reference ``src/etl/etl_manager.py:505-506``).
DATE_FIELDS = [
    "date",
    "created_at",
    "updated_at",
    "birth_date",
    "admission_date",
    "discharge_date",
]

#: T2 format precedence — first parse wins; ``MM/dd`` before ``dd/MM`` is
#: load-bearing (reference ``src/etl/etl_manager.py:507-519``).
DATE_FORMATS = ["yyyy-MM-dd", "MM/dd/yyyy", "dd/MM/yyyy", "yyyyMMdd"]

#: T3 targets (reference ``src/etl/etl_manager.py:529-530``).
CODE_FIELDS = [
    "diagnosis_code",
    "procedure_code",
    "icd10_code",
    "cpt_code",
    "ndc_code",
    "loinc_code",
]

#: T5 exact-match null sentinels (reference ``src/etl/etl_manager.py:556``).
NULL_SENTINELS = ["", "NULL", "null", "N/A", "n/a", "NA", "None", "none"]


def with_ingest_order(df: DataFrame) -> DataFrame:
    """Stamp a monotonic ingestion-order column if absent.

    ``monotonically_increasing_id`` encodes (partition id, offset) — it
    preserves the source read order within and across input partitions
    without any shuffle or driver round-trip, so it scales to arbitrarily
    wide ingests.
    """
    if INGEST_ORDER_COL in df.columns:
        return df
    return df.withColumn(INGEST_ORDER_COL, F.monotonically_increasing_id())


# --------------------------------------------------------------------- T1
def deduplicate(df: DataFrame, id_field: str = "id") -> DataFrame:
    """Keep the first occurrence per ``str(id)`` (reference
    ``src/etl/etl_manager.py:482-496``).

    A missing/NULL id collapses with ``""`` in the reference (``str`` of a
    missing key is ``""`` there) — mirrored by coalescing to ``''``.
    ``dropDuplicates`` keeps an *arbitrary* row, so first-wins is realized
    with a window over the ingestion-order column. The window shuffles once
    on the id — the same shuffle any engine needs for a keyed dedup — and
    AQE handles skewed ids.
    """
    if id_field not in df.columns:
        return df
    df = with_ingest_order(df)
    from pyspark.sql.window import Window

    key = F.coalesce(F.col(id_field).cast("string"), F.lit(""))
    w = Window.partitionBy(key).orderBy(F.col(INGEST_ORDER_COL).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------- T2
def standardized_date_col(c: Column) -> Column:
    """First-parse-wins date normalization to ``yyyy-MM-dd``; unparseable
    values pass through unchanged (reference ``etl_manager.py:507-519``)."""
    parsed = F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS])
    return F.when(
        c.isNotNull() & parsed.isNotNull(), F.date_format(parsed, "yyyy-MM-dd")
    ).otherwise(c)


def standardize_dates(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    fields = fields if fields is not None else DATE_FIELDS
    out = df
    for f_name in fields:
        if f_name in out.columns:
            out = out.withColumn(f_name, standardized_date_col(F.col(f_name)))
    return out


# --------------------------------------------------------------------- T3
def uppercase_code_col(c: Column) -> Column:
    """``str(v).upper().strip()`` when truthy (reference
    ``etl_manager.py:524-537``)."""
    s = c.cast("string")
    return F.when(s.isNotNull() & (s != ""), F.trim(F.upper(s))).otherwise(c)


def uppercase_codes(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    fields = fields if fields is not None else CODE_FIELDS
    out = df
    for f_name in fields:
        if f_name in out.columns:
            out = out.withColumn(f_name, uppercase_code_col(F.col(f_name)))
    return out


# --------------------------------------------------------------------- T4
#: Python ``str.strip()`` strips Unicode White_Space plus the C0 separators
#: FS/GS/RS/US (0x1c-0x1f); Spark ``trim`` strips ASCII 0x20 only.  Java's
#: ``\p{IsWhite_Space}`` covers the Unicode set, so the union class below is
#: exact ``str.strip()`` parity (found by hypothesis: '\xa0' NBSP survived
#: ``F.trim``).
_PY_STRIP_RE = r"^[\p{IsWhite_Space}\x1c-\x1f]+|[\p{IsWhite_Space}\x1c-\x1f]+$"


def trim_strings(df: DataFrame) -> DataFrame:
    """Strip every string-typed column (reference ``etl_manager.py:539-549``).

    Schema-driven (one projection, no per-value isinstance): only
    ``StringType`` columns are touched.  Uses a Unicode-whitespace regexp, not
    ``F.trim``, because the reference strips via Python ``str.strip()`` which
    removes NBSP/ideographic spaces that ``trim`` leaves behind.
    """
    cols = [
        F.regexp_replace(F.col(f.name), _PY_STRIP_RE, "").alias(f.name)
        if isinstance(f.dataType, StringType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


# --------------------------------------------------------------------- T5
def null_handling(df: DataFrame) -> DataFrame:
    """Exact-match sentinel strings -> NULL, string columns only
    (reference ``etl_manager.py:551-563``)."""
    cols = [
        F.when(F.col(f.name).isin(NULL_SENTINELS), F.lit(None))
        .otherwise(F.col(f.name))
        .alias(f.name)
        if isinstance(f.dataType, StringType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


# --------------------------------------------------------------------- T6
def add_metadata(df: DataFrame, batch_ts: str, version: int = 1) -> DataFrame:
    """Stamp ``_processed_at`` (ONE shared timestamp per batch — not
    ``current_timestamp()`` per row) and ``_version`` (reference
    ``etl_manager.py:565-576``)."""
    return df.withColumn("_processed_at", F.lit(batch_ts)).withColumn(
        "_version", F.lit(version)
    )


# ------------------------------------------------------------------ registry
@dataclass
class TransformSpec:
    """Mirror of the reference's ``TransformSpec``
    (``src/etl/etl_manager.py:118-124``), with a DataFrame-native fn."""

    name: str
    transform_fn: Callable[[DataFrame], DataFrame]
    description: str = ""


@dataclass
class TransformRegistry:
    """Named transform registry; application is config-ordered with unknown
    names silently skipped (reference ``src/etl/etl_manager.py:253-262``)."""

    transforms: dict[str, TransformSpec] = field(default_factory=dict)

    def register(self, spec: TransformSpec) -> None:
        self.transforms[spec.name] = spec

    def apply(self, df: DataFrame, names: list[str]) -> DataFrame:
        out = df
        for name in names:
            spec = self.transforms.get(name)
            if spec is None:
                continue  # silent skip, reference :255
            out = spec.transform_fn(out)
        return out


def standard_registry(batch_ts: str) -> TransformRegistry:
    """The six standard transforms (reference
    ``src/etl/etl_manager.py:162-199``)."""
    reg = TransformRegistry()
    reg.register(TransformSpec("deduplicate", deduplicate, "first-wins dedup on id"))
    reg.register(
        TransformSpec("standardize_dates", standardize_dates, "dates -> yyyy-MM-dd")
    )
    reg.register(
        TransformSpec("uppercase_codes", uppercase_codes, "upper+strip code fields")
    )
    reg.register(TransformSpec("trim_strings", trim_strings, "strip string columns"))
    reg.register(
        TransformSpec("null_handling", null_handling, "sentinel strings -> NULL")
    )
    reg.register(
        TransformSpec(
            "add_metadata",
            lambda df: add_metadata(df, batch_ts),
            "stamp _processed_at/_version",
        )
    )
    return reg


def python_record_transform(
    name: str,
    record_fn: Callable[[dict], dict],
    description: str = "",
) -> TransformSpec:
    """Adapter for the RECORD-WISE SUBSET of the reference's arbitrary
    Python transform escape hatch. The reference's TransformSpec types
    ``transform_fn`` as ``Callable[[list[dict]], list[dict]]`` — BATCH
    level (reference ``src/etl/etl_manager.py:123``); a reference
    transform doing cross-record work within a batch (dedup inside the
    list, running totals) cannot ride this adapter. This wrapper covers
    the common per-record case (``dict -> dict`` applied element-wise),
    wrapping the callable in Arrow-batched ``mapInPandas`` so it plugs
    into the registry next to the Column-native transforms; batch-level
    reference transforms map onto ``mapInPandas`` directly (each Arrow
    batch IS a list of records) rather than through this helper.

    THE PERF CLIFF, explicitly: this moves every row through Python.
    Arrow batching keeps it ~10-100x faster than a row-at-a-time UDF, but
    it is still orders slower than the JVM Column transforms — reserve it
    for logic Columns genuinely can't express, and keep it OUT of 100 TB
    hot paths. Schema is preserved (dict keys must match columns).
    """

    def apply(df: DataFrame) -> DataFrame:
        schema = df.schema
        cols = [f.name for f in schema.fields]

        def run(batches):
            for pdf in batches:
                recs = [record_fn(dict(zip(cols, row))) for row in
                        pdf.itertuples(index=False, name=None)]
                import pandas as pd

                yield pd.DataFrame(recs, columns=cols)

        return df.mapInPandas(run, schema=schema)

    return TransformSpec(name, apply, description or f"python record fn {name}")
