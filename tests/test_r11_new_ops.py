"""Unit tests for the round-11 additions: JL random projection,
C4 global line dedup, hashing-trick linear classifier,
sorted-neighborhood entity resolution, perceptual-hash near-dup,
and the KMV theta-sketch intersection."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from healthcare_data_lakehouse_spark.functions import similarity as S
from healthcare_data_lakehouse_spark.queries.catalog import load_all


@pytest.fixture(scope="module")
def qs():
    return load_all()


# ------------------------------------------------ JL random projection
def test_jl_sign_matrix_is_balanced_and_deterministic():
    assert len(S.JL_SIGNS) == S.JL_K
    assert all(len(r) == 64 for r in S.JL_SIGNS)
    assert all(v in (1.0, -1.0) for r in S.JL_SIGNS for v in r)
    # a striped (alternating) matrix would make every projected dim
    # identical up to sign — require the rows to be genuinely distinct
    assert len({tuple(r) for r in S.JL_SIGNS}) == S.JL_K
    flat = [v for r in S.JL_SIGNS for v in r]
    bal = sum(flat) / len(flat)
    assert abs(bal) < 0.2  # roughly mean-zero, else dots are biased


def test_jl_project_preserves_cosine_roughly(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float((i * 37 + d * 11) % 13 - 6) for d in range(64)])
         for i in range(6)]
    )
    p = df.select("vec_id", S.jl_project("embedding").alias("pv")).collect()
    by_id = {r.vec_id: r.pv for r in p}
    assert all(len(v) == S.JL_K for v in by_id.values())
    raw = {r.vec_id: r.embedding for r in df.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den

    # JL with k=16 keeps cosine within ~3/sqrt(k) of exact
    for i in range(5):
        err = abs(cos(by_id[i], by_id[i + 1]) - cos(raw[i], raw[i + 1]))
        assert err < 0.75


def test_jl_recall_query_shape_and_bounds(spark, sf_dir, qs):
    rows = qs["similarity_recall_jl_at5"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_exact == 5 and r.n_jl == 5
        assert 0 <= r.n_overlap <= 5
        assert r.recall_at_5 == round(r.n_overlap / 5, 2)


def test_jl_cosine_error_within_lemma_scale(spark, sf_dir, qs):
    rows = qs["embedding_jl_cosine_error"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        # k=16 Rademacher: typical error ~0.25, tails bounded well under 1
        assert 0.0 <= r.mean_abs_err < 0.45
        assert r.mean_abs_err <= r.max_abs_err <= 1.2


# ------------------------------------------------ C4 global line dedup
def test_c4_line_global_first_doc_keeps_everything(spark, qs, monkeypatch):
    # the query module binds `table` at import time — patch ITS binding
    import healthcare_data_lakehouse_spark.queries.llm_dedup as M

    base = " ".join(f"w{i}" for i in range(16))  # exactly 2 lines of 8
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),                      # full dup: keeps 0
            Row(doc_id=3, text=base + " tail extra"),      # 2 dup lines + 1 new
        ]
    )
    monkeypatch.setattr(M, "table", lambda s, d, n: df)
    out = {
        r.doc_id: r
        for r in M.dedup_c4_line_global(spark, "unused").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].n_kept == out[1].n_lines == 2
    assert out[1].kept_frac == 1.0
    assert out[2].n_kept == 0 and out[2].kept_frac == 0.0
    # doc 3: lines 1-2 duplicate doc 1's, line 3 is the new 2-token tail
    assert out[3].n_lines == 3 and out[3].n_kept == 1
    assert out[3].kept_tokens == 2


def test_c4_line_global_invariants_on_fixture(spark, sf_dir, qs):
    rows = qs["dedup_c4_line_global"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    total_lines = sum(r.n_lines for r in rows)
    total_kept = sum(r.n_kept for r in rows)
    assert 0 < total_kept <= total_lines
    for r in rows:
        assert 0 <= r.n_kept <= r.n_lines
        assert 0 <= r.kept_tokens <= r.total_tokens
        assert 0.0 <= r.kept_frac <= 1.0


# ------------------------------------- hashing-trick linear classifier
def test_hashed_classifier_deterministic_and_bounded(spark, sf_dir, qs):
    fn = qs["text_hashed_linear_classifier"].fn
    a = {r.doc_id: (r.score, r.label_pred) for r in fn(spark, sf_dir).collect()}
    b = {r.doc_id: (r.score, r.label_pred) for r in fn(spark, sf_dir).collect()}
    assert a == b
    for score, label in a.values():
        assert -1.0 <= score <= 1.0  # mean of weights in [-1, 1]
        assert label == (score > 0) or abs(score) < 1e-6


# ------------------------------------ sorted-neighborhood entity resolution
def test_snm_finds_truncation_variants(spark, sf_dir, qs):
    rows = qs["er_sorted_neighborhood_pairs"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    # every emitted pair involves a variant, passed the distance gate,
    # and sits inside the window
    for r in rows:
        assert r.id_a >= 1_000_000 or r.id_b >= 1_000_000
        assert r.name_dist <= 2
        assert 1 <= r.rank_gap <= 4
    # a truncated variant sorts immediately before its master (prefix
    # order), so every variant must be matched to its own master at
    # distance 1 somewhere in the pair set
    matched = {
        (r.id_a, r.id_b) for r in rows if r.name_dist == 1
    }
    import duckdb

    keys = [
        k
        for (k,) in duckdb.sql(
            f"SELECT c_custkey FROM read_parquet('{sf_dir}/customer.parquet') "
            "WHERE c_custkey % 10 = 3"
        ).fetchall()
    ]
    assert len(keys) > 0
    for k in keys:
        assert (k + 1_000_000, k) in matched or (k, k + 1_000_000) in matched


# ----------------------------------- perceptual-hash near-dup (multimodal)
def test_phash16_signature_bits_and_determinism(spark):
    from healthcare_data_lakehouse_spark.functions.multimodal import (
        as_binary_assets,
        phash_signatures,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaa aaaa aaaa aaaa zzzz zzzz zzzz zzzz"),
            Row(doc_id=2, text="aaaa aaaa aaaa aaaa zzzz zzzz zzzz zzzz"),
            Row(doc_id=3, text="zzzz zzzz zzzz zzzz aaaa aaaa aaaa aaaa"),
        ]
    )
    sig = {
        r.asset_id: r.sig
        for r in phash_signatures(as_binary_assets(df)).collect()
    }
    assert sig[1] == sig[2]            # identical payloads, identical sigs
    assert 0 <= sig[1] < 2**48  # widened 32 -> 48 bits in r12 (scale fix)
    assert sig[1] != sig[3]            # swapped energy profile flips bits


def test_phash_neardup_pairs_symmetric_and_banded(spark, sf_dir, qs):
    rows = qs["multimodal_phash_neardup"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 2
        assert (r.id_a, r.id_b) not in seen  # distinct pairs only
        seen.add((r.id_a, r.id_b))


# ----------------------------------------- KMV theta-sketch intersection
def test_kmv_theta_intersection_estimates(spark, sf_dir, qs):
    rows = qs["sketch_kmv_theta_intersection"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 64
    assert 0.0 < r.theta <= 1.0
    assert 0 <= r.n_common <= r.n_union
    assert r.est_intersection <= r.est_union + 1e-9
    assert 0.0 <= r.est_jaccard <= 1.0
    # estimator sanity: within 60% of exact at k=64 on this fixture
    assert r.exact_intersection > 0
    assert r.rel_error < 0.6


# ----------------------------------------- weighted (multiset) Jaccard
def test_weighted_jaccard_exact_dups_score_one(spark, sf_dir, qs):
    rows = qs["dedup_weighted_jaccard_pairs"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    injected = [r for r in rows if r.id_b == r.id_a + 1_000_000]
    assert len(injected) > 0  # the controlled exact copies must surface
    for r in injected:
        assert r.set_jaccard == 1.0 and r.weighted_jaccard == 1.0
    for r in rows:
        assert 0.0 < r.weighted_jaccard <= 1.0
        assert 0.5 <= r.set_jaccard <= 1.0  # LSH threshold gate


# --------------------------------------- embedding eval: silhouette + kNN
def test_silhouette_bounds_and_labels(spark, sf_dir, qs):
    rows = qs["embedding_silhouette_by_label"].fn(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert 0.0 <= r.frac_misclustered <= 1.0
        assert r.n > 0


def test_knn_label_accuracy_shape(spark, sf_dir, qs):
    rows = qs["embedding_knn_label_accuracy"].fn(spark, sf_dir).collect()
    assert sum(r.n_panel for r in rows) == 50  # leave-one-out panel size
    for r in rows:
        assert 0 <= r.n_correct <= r.n_panel
        assert abs(r.accuracy - round(r.n_correct / r.n_panel, 4)) < 1e-9


# ----------------------------- consistent-hash ring + Chatterjee's xi
def test_ring_balance_arcs_and_shares(spark, sf_dir, qs):
    rows = qs["pipeline_shard_ring_balance"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    assert abs(sum(r.arc_frac for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-3
    assert sum(r.n_docs for r in rows) > 0
    for r in rows:
        assert r.n_vnodes == 16
        assert 0.0 < r.arc_frac < 1.0


def test_chatterjee_xi_bounds_and_independence(spark, sf_dir, qs):
    rows = qs["stats_chatterjee_xi_value_by_type"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # xi in [-0.5, 1]; iid value-vs-time should hover near 0
        assert -0.5 <= r.xi <= 1.0
        assert abs(r.xi) < 0.25  # fixture values are time-independent
        assert r.n > 0


# ------------------------------------------------- skyline Pareto front
def test_skyline_no_strict_dominators(spark, sf_dir, qs):
    rows = qs["orders_skyline_price_quantity"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.mktsegment, []).append((r.price, r.qty))
    for seg, pts in by_seg.items():
        for p1, q1 in pts:
            # no front point strictly dominates another front point
            assert not any(
                p2 < p1 and q2 > q1 for p2, q2 in pts
            ), f"{seg}: ({p1},{q1}) dominated within front"
        # the segment's cheapest order is always on the front
        assert min(p for p, _ in pts) > 0
