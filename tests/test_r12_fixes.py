"""Round-12 ADVICE fixes, each pinned by a test:

1. multimodal_phash_neardup was only ever verified on fixtures where both
   engines return 0 rows (vacuous). Drive it over a seeded fixture with
   injected exact copies (identical payloads => Hamming 0, pairs
   guaranteed) and compare the Spark output to the DuckDB oracle directly.
2. The phash oracle equates unicode(substr(text,i,1))/length(text) with
   UTF-8 byte values/byte length — valid only for pure-ASCII text. Pin
   the ASCII invariant on every shipped fixture SF and on the scale
   generator's vocabulary so a generator change fails loudly.
3. sketch_kmv_theta_intersection divided rel_error by exact_intersection
   with no zero guard (Spark NULL vs DuckDB inf on zero overlap). Both
   engines now NULLIF; verify they agree on a zero-overlap fixture.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from healthcare_data_lakehouse_spark.queries.catalog import load_all


@pytest.fixture(scope="module")
def qs():
    return load_all()


def _write_documents(path, texts):
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array([f"src{i % 20}" for i in range(len(texts))]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(path / "documents.parquet"),
    )


# ------------------------------------ 1. phash near-dup: non-vacuous oracle
def test_phash_neardup_nonempty_and_matches_oracle(spark, tmp_path, qs):
    """ADVICE r11 (medium): every recorded oracle run of
    multimodal_phash_neardup showed 0 rows on both engines, so a
    divergence between the Arrow signature path and the oracle's
    character-window recomputation would never have been caught. This
    fixture injects exact copies (Hamming 0 guaranteed) plus random
    word salads, asserts the result is NON-empty, and compares the
    Spark rows to the oracle rows value-for-value."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_scale_fixture import DOC_VOCAB

    rng = np.random.default_rng(7)
    vocab = np.array(DOC_VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), int(n))])
        for n in rng.integers(10, 101, 40)
    ]
    # exact copies of 6 base docs — identical payload => identical
    # signature => Hamming 0, so the banded join MUST emit these pairs
    texts.extend(texts[i] for i in range(6))
    _write_documents(tmp_path, texts)

    spec = qs["multimodal_phash_neardup"]
    s_rows = {
        (r.id_a, r.id_b, r.hamming)
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    d_rows = {tuple(r) for r in con.sql(spec.oracle).fetchall()}

    assert len(s_rows) > 0  # non-vacuous: injected dups must surface
    injected = {(i, 40 + i, 0) for i in range(6)}
    assert injected <= s_rows
    assert s_rows == d_rows  # the Arrow boundary is genuinely hash-checked


# ----------------------------------- 2. ASCII invariant behind that oracle
def test_documents_fixture_is_ascii():
    """The phash oracle (and every unicode(substr(...)) byte-as-char
    trick in the catalog) assumes pure-ASCII document text. Pin it on
    every shipped SF and on the scale generator's vocabulary."""
    for sf in ("0.001", "0.01", "0.1"):
        texts = pq.read_table(
            f"/root/testdata/sf{sf}/documents.parquet", columns=["text"]
        )["text"].to_pylist()
        assert all(t.isascii() for t in texts), f"non-ASCII text at sf{sf}"

    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_scale_fixture import DOC_VOCAB

    assert all(w.isascii() for w in DOC_VOCAB)
    assert " dup".isascii()  # the planted-dup marker


# --------------------------- 3. KMV theta: zero-overlap degenerate parity
def test_kmv_theta_zero_overlap_null_on_both_engines(spark, tmp_path, qs):
    """Disjoint click/purchase audiences: exact_intersection = 0, so
    rel_error must be NULL on BOTH engines (NULLIF twin), never
    Spark-NULL vs DuckDB-inf."""
    n = 40
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(t0 + np.arange(n) * 1_000_000, pa.timestamp("us")),
            # users 0..19 click, 100..119 purchase — zero overlap
            "user_id": pa.array(
                [i for i in range(20)] + [100 + i for i in range(20)],
                pa.int64(),
            ),
            "event_type": pa.array(["click"] * 20 + ["purchase"] * 20),
            "value": pa.array([1.0] * n),
            "props": pa.array(['{"k": 1}'] * n),
        }),
        str(tmp_path / "events.parquet"),
    )
    spec = qs["sketch_kmv_theta_intersection"]
    s = spec.fn(spark, str(tmp_path)).collect()
    assert len(s) == 1
    assert s[0].exact_intersection == 0
    assert s[0].rel_error is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    d = con.sql(spec.oracle).fetchall()
    assert len(d) == 1
    cols = [c for c in con.sql(spec.oracle).columns]
    rec = dict(zip(cols, d[0]))
    assert rec["exact_intersection"] == 0
    assert rec["rel_error"] is None
    # full-row parity on the degenerate case, not just the guarded column
    srow = s[0].asDict()
    for c in cols:
        sv, dv = srow[c], rec[c]
        if isinstance(sv, float) and isinstance(dv, float):
            assert abs(sv - dv) < 1e-12, c
        else:
            assert sv == dv, c
