"""Z-order clustering: correctness of the Morton interleave and a
measurable min-max-pruning win on real parquet footers."""

from __future__ import annotations

import glob
import os
import tempfile

import pyspark.sql.functions as F

from healthcare_data_lakehouse_spark.functions.clustering import (
    write_zordered,
    z_value,
)


def test_z_value_interleaves_bits(spark):
    rows = (
        spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (2, 1)], "x int, y int"
        )
        .select("x", "y", z_value("x", "y", bits=4).alias("z"))
        .collect()
    )
    got = {(r.x, r.y): r.z for r in rows}
    # x -> even bits, y -> odd bits
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(3, 3)] == 15
    assert got[(2, 1)] == 0b0110


def _minmax_widths(path: str, col_user: str, col_day: str):
    """Per-file (user-range, day-range) widths from parquet footer stats."""
    import pyarrow.parquet as pq

    widths = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ui, di = schema_names.index(col_user), schema_names.index(col_day)
        u_lo = min(md.row_group(g).column(ui).statistics.min for g in range(md.num_row_groups))
        u_hi = max(md.row_group(g).column(ui).statistics.max for g in range(md.num_row_groups))
        d_lo = min(md.row_group(g).column(di).statistics.min for g in range(md.num_row_groups))
        d_hi = max(md.row_group(g).column(di).statistics.max for g in range(md.num_row_groups))
        widths.append((u_hi - u_lo, d_hi - d_lo))
    return widths


def test_zorder_narrows_minmax_on_both_dims(spark, sf_dir):
    from healthcare_data_lakehouse_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.dayofmonth("ts").alias("day"), "event_id", "value"
    )
    work = tempfile.mkdtemp(prefix="zorder_")
    base_path = os.path.join(work, "baseline")
    z_path = os.path.join(work, "zordered")

    # baseline: round-robin layout (what a plain parallel write produces)
    ev.repartition(8).write.parquet(base_path)
    write_zordered(ev, z_path, "user_id", "day", n_files=8, bits=8)

    base = _minmax_widths(base_path, "user_id", "day")
    zord = _minmax_widths(z_path, "user_id", "day")
    avg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    base_u, base_d = avg([u for u, _ in base]), avg([d for _, d in base])
    z_u, z_d = avg([u for u, _ in zord]), avg([d for _, d in zord])
    # every baseline file spans ~the full domain of both columns; the
    # z-ordered layout must be materially narrower on BOTH dimensions
    assert z_u < base_u * 0.8, (z_u, base_u)
    assert z_d < base_d * 0.8, (z_d, base_d)

    # and the clustered table is still the same table
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(base_path).count()
    )


def test_zorder_skips_files_for_predicate(spark, sf_dir):
    """End to end: a selective user_id predicate over the z-ordered table
    reads fewer files than the total (file-level min-max skipping)."""
    from healthcare_data_lakehouse_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.dayofmonth("ts").alias("day"), "event_id"
    )
    work = tempfile.mkdtemp(prefix="zskip_")
    z_path = os.path.join(work, "z")
    write_zordered(ev, z_path, "user_id", "day", n_files=8, bits=8)

    back = spark.read.parquet(z_path)
    q = back.filter(F.col("user_id") == 3)
    # correctness of the filtered read
    expected = ev.filter(F.col("user_id") == 3).count()
    assert q.count() == expected and expected > 0
    # the predicate is pushed to the reader over the clustered layout
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters", 1)[1][:200]
