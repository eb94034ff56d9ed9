"""tools/gen_scale_fixture.py must stay a faithful twin of the shipped
fixtures: identical schemas (the TIMESTAMP(NANOS) events quirk included),
matching value domains, and the documented scaling ratios — otherwise
SCALE_BENCH.md's ratios measure generator drift, not data growth."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

import gen_scale_fixture as G  # noqa: E402

SHIPPED = Path("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("genfix") / "sf0.001"
    G.generate(0.001, str(out), seed=7)
    return out


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize("name", TABLES)
def test_schema_matches_shipped(gen_dir, name):
    shipped = pq.read_schema(SHIPPED / f"{name}.parquet")
    gen = pq.read_schema(gen_dir / f"{name}.parquet")
    assert [
        (f.name, str(f.type)) for f in shipped
    ] == [(f.name, str(f.type)) for f in gen]


def test_row_counts_match_shipped_ratios(gen_dir):
    for name, expected in [
        ("region", 5), ("nation", 25), ("customer", 150),
        ("supplier", 10), ("part", 200), ("orders", 1500),
        ("lineitem", 6000), ("events", 1000),
        ("documents", 500), ("embeddings", 500),
    ]:
        got = pq.read_metadata(gen_dir / f"{name}.parquet").num_rows
        assert got == expected, f"{name}: {got} != {expected}"


def test_value_domains_match(gen_dir):
    import duckdb

    con = duckdb.connect()

    def vals(d, sql):
        return con.sql(sql.format(d=d)).fetchall()

    for sql in [
        "SELECT DISTINCT r_name FROM '{d}/region.parquet' ORDER BY 1",
        "SELECT DISTINCT c_mktsegment FROM '{d}/customer.parquet' ORDER BY 1",
        "SELECT DISTINCT o_orderstatus FROM '{d}/orders.parquet' ORDER BY 1",
        "SELECT DISTINCT o_orderpriority FROM '{d}/orders.parquet' ORDER BY 1",
        "SELECT DISTINCT p_type FROM '{d}/part.parquet' ORDER BY 1",
        "SELECT DISTINCT event_type FROM '{d}/events.parquet' ORDER BY 1",
        "SELECT DISTINCT lang FROM '{d}/documents.parquet' ORDER BY 1",
    ]:
        assert vals(SHIPPED, sql) == vals(gen_dir, sql), sql

    # embeddings are unit-norm 64-d; documents carry planted dups
    (dim,) = con.sql(
        f"SELECT DISTINCT len(embedding) FROM '{gen_dir}/embeddings.parquet'"
    ).fetchone()
    assert dim == 64
    (n_dupmark,) = con.sql(
        f"SELECT COUNT(*) FROM '{gen_dir}/documents.parquet' "
        "WHERE text LIKE '% dup'"
    ).fetchone()
    assert n_dupmark >= 10  # ~5% of 500, minus the exact-copy share
