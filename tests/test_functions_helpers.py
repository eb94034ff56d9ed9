"""Tests for the shared column/prefix-sum helpers added in round 3."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_dround_matches_decimal_semantics(spark):
    """dround must round half-up on the DECIMAL rendering, not the binary
    double — the exact cases where Spark's ROUND(double) and DuckDB
    diverge."""
    import duckdb

    from healthcare_data_lakehouse_spark.functions import dround, dround_sql

    vals = [251483.295, 0.12345, 2.675, 1.0 / 3, 123456789.005, -2.675, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.r
        for r in df.select(dround(F.col("v"), 2).alias("r")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {dround_sql(repr(v), 2)}").fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_running_sum_over_equals_global_window(spark):
    """The partition-offset prefix sum must equal the naive single-partition
    running sum for any duplicate-free order key."""
    from healthcare_data_lakehouse_spark.functions.ordered import running_sum_over

    rows = [(i * 7 % 1009, (-1) ** i * (i % 13)) for i in range(1009)]
    df = spark.createDataFrame(rows, "k int, d int")
    got = {
        (r.k, r.c)
        for r in running_sum_over(df, "k", "d", "c", n_parts=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.c)
        for r in df.withColumn("c", F.sum("d").over(w)).collect()
    }
    assert got == want


def test_normalize_event_ts_ntz_and_bigint(spark):
    from healthcare_data_lakehouse_spark.tables import normalize_event_ts

    base = datetime.datetime(2026, 1, 2, 3, 4, 5)
    ntz = spark.createDataFrame([(base,)], "ts timestamp_ntz")
    out = normalize_event_ts(ntz)
    assert dict(out.dtypes)["ts"] == "timestamp"
    # session tz is UTC, so the wall-clock value is preserved exactly
    assert out.collect()[0].ts == base

    nanos = int(base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e9)
    big = spark.createDataFrame([(nanos,)], "ts bigint")
    out2 = normalize_event_ts(big)
    assert dict(out2.dtypes)["ts"] == "timestamp"
    assert out2.collect()[0].ts == base

    # already-typed frames pass through untouched
    plain = spark.createDataFrame([(base,)], "ts timestamp")
    assert normalize_event_ts(plain) is plain


def test_prefix_filter_equals_exhaustive_jaccard(spark, sf_dir):
    """PPJoin prune (prefix + size-ratio + array verify) is lossless: same
    pairs as the exhaustive shingle self-join at the same threshold."""
    from healthcare_data_lakehouse_spark.functions.dedup import (
        jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from healthcare_data_lakehouse_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    t = 0.6
    want = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(docs, threshold=t).collect()
    }
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs, threshold=t).collect()
    }
    assert got == want


def test_oph_signature_properties(spark):
    """OPH (one-permutation hashing): densification leaves no NULL bins,
    identical texts get identical signatures (estimate 1.0), and the
    estimator tracks Jaccard on a known-overlap pair."""
    from pyspark.sql import functions as F

    from healthcare_data_lakehouse_spark.functions import dedup as D

    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),          # exact dup of 0
        (2, "a b c d e f zz yy"),        # partial overlap with 0
        (3, "q"),                        # single-shingle doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = D.oph_signature(df).collect()
    byid = {r.doc_id: [r[f"oph_{j}"] for j in range(D.OPH_BINS)] for r in sig}
    assert len(byid) == 4
    for vals in byid.values():
        assert all(v is not None for v in vals)  # densified
    assert byid[0] == byid[1]  # identical docs -> identical signatures
    # doc 3 has ONE shingle: every bin densifies to the same single hash
    assert len(set(byid[3])) == 1
    # partial overlap: estimate strictly between 0 and 1 of doc 0
    matches = sum(a == b for a, b in zip(byid[0], byid[2]))
    assert 0 < matches < D.OPH_BINS
