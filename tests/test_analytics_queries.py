"""Smoke + sanity tests for the analytics query catalog at sf0.001."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def specs():
    from healthcare_data_lakehouse_spark.queries.catalog import load_all

    return load_all()


def test_flagship_entry(spark, sf_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_all_queries_run_and_nonempty(spark, sf_dir, specs):
    for name, spec in specs.items():
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_alignment_duckdb(spark, sf_dir, specs):
    """Every oracle runs on DuckDB and matches column names."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, spec in specs.items():
        if spec.oracle is None:
            continue
        res = con.execute(spec.oracle)
        d_cols = [c[0] for c in res.description]
        s_cols = spec.fn(spark, sf_dir).columns
        assert sorted(d_cols) == sorted(s_cols), name
