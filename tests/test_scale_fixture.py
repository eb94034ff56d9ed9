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


# ------------------------------------------- open-vocabulary mode (r12)
@pytest.fixture(scope="module")
def open_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("openfix")
    small, big = base / "s", base / "b"
    G.generate(0.02, str(small), seed=7, vocab="open")
    G.generate(0.2, str(big), seed=7, vocab="open")
    return small, big


def test_open_vocab_grows_heaps_like(open_dirs):
    """The whole point of open mode (VERDICT r11 ask #4): the realized
    vocabulary must GROW with corpus size (Heaps regime) instead of
    saturating at the closed mode's 30 types, and shingle document
    frequency must stay roughly flat instead of scaling with N."""
    import duckdb

    con = duckdb.connect()

    def stats(d):
        return con.sql(f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM '{d}/documents.parquet'
            )
            SELECT COUNT(DISTINCT w) AS types, COUNT(*) AS tokens,
                   (SELECT AVG(df) FROM (
                       SELECT COUNT(DISTINCT doc_id) AS df FROM toks
                       GROUP BY w)) AS avg_df
            FROM toks
        """).fetchone()

    (types_s, tokens_s, df_s) = stats(open_dirs[0])
    (types_b, tokens_b, df_b) = stats(open_dirs[1])
    assert types_s > 1000  # far beyond the closed 30-word lexicon
    # Heaps: 10x tokens must yield substantially more types (beta > 0,
    # sublinear) but nowhere near saturation
    assert 2.0 < types_b / types_s < 10.0
    # per-word document frequency must not explode 10x like closed mode
    # (PERF_r11: closed avg shingle df went 10.1 -> 99.5 at 10x data)
    assert df_b / df_s < 3.0


def test_open_vocab_keeps_recipe_and_ascii(open_dirs):
    import duckdb

    con = duckdb.connect()
    small = open_dirs[0]
    n, n_dupmark = con.sql(f"""
        SELECT COUNT(*),
               SUM(CASE WHEN text LIKE '% dup' THEN 1 ELSE 0 END)
        FROM '{small}/documents.parquet'
    """).fetchone()
    assert n == 1000
    assert n_dupmark > 20  # planted-dup recipe intact (~5% minus exacts)
    texts = pq.read_table(
        small / "documents.parquet", columns=["text"]
    )["text"].to_pylist()
    assert all(t.isascii() for t in texts)  # phash oracle invariant
    # doc-length recipe unchanged: 10..100 words per doc
    lens = [len(t.split(" ")) for t in texts]
    assert 10 <= min(lens) and max(lens) <= 101


def test_closed_mode_unchanged_by_vocab_plumbing(gen_dir):
    """Adding the vocab parameter must not perturb the closed-mode rng
    stream: the same seed still yields the shipped-fixture twin (the
    fidelity tests above run on closed mode), and a doc built from the
    closed lexicon contains only DOC_VOCAB words."""
    texts = pq.read_table(
        gen_dir / "documents.parquet", columns=["text"]
    )["text"].to_pylist()
    vocab = set(G.DOC_VOCAB)
    words = set(texts[0].split(" "))
    assert words <= vocab
