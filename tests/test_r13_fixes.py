"""Round-13 verdict asks, each pinned by a test:

1. dedup_dfcap_recall_audit must MEASURE the dfcap miss condition, not
   state it: on a corpus where a qualifying pair shares only high-df
   (boilerplate) shingles, recall at a small cap must come out < 1.0 and
   recall at a cap above the boilerplate df must come out 1.0. On the
   shipped fixtures recall is 1.0 at every cap (planted dups share their
   rare shingles) — the stated bound the driver record evidences.
2. multimodal_phash_neardup_seeded must be non-vacuous at the DRIVER
   grain: >= 1 output row on the plain sf0.001/sf0.01 fixtures (planted
   exact copies guarantee Hamming-0 pairs through the banding).
3. dedup_candidate_selectivity_compare's ground-truth arm is df-capped
   (r12: the raw self-join truth OOM'd at closed sf3.0). The bound must
   be NAMED in the output schema (truth_max_df: 0 on exact_hash, 64 on
   the verified rows) and the three methods' counts must keep their
   invariants (verified <= candidates; exact is perfect-precision).
"""

from __future__ import annotations

import pytest

from healthcare_data_lakehouse_spark.queries.catalog import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return load_all()


# ------------------------- 1. dfcap recall audit detects real misses
def test_dfcap_recall_audit_detects_boilerplate_miss(spark, tmp_path, qs):
    """Construct a corpus where the only J>=0.8 pair beyond the planted
    dups is two boilerplate-only docs whose every shared shingle has
    df ~ 24 (> 16, <= 64): the audit must report recall < 1 at cap 16
    and recall == 1 at caps 64/256 — i.e. it can actually see a miss."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    boiler = "alpha beta gamma delta epsilon zeta"
    texts = []
    # 22 docs carrying the boilerplate plus a unique tail: raises the
    # boilerplate shingles' df to ~24 without creating J>=0.8 pairs
    # (the unique tails push pairwise Jaccard far below threshold).
    for i in range(22):
        tail = " ".join(f"tok{i}w{j}" for j in range(12))
        texts.append(boiler + " " + tail)
    # the boilerplate-only twins: J = 1.0, every shared shingle is a
    # boilerplate shingle with df = 24 (22 carriers + these 2)
    texts.append(boiler)
    texts.append(boiler)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {
        r.max_df: r
        for r in qs["dedup_dfcap_recall_audit"].fn(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {16, 64, 256}
    n_truth = rows[16].n_truth_pairs
    assert n_truth > 0, "truth set must be non-empty"
    # every truth pair is counted identically at every cap
    assert all(r.n_truth_pairs == n_truth for r in rows.values())
    # the boilerplate-only twin pair is MISSED at cap 16 (its min shared
    # df is 24) and caught at 64/256
    assert rows[16].n_caught < n_truth
    assert rows[16].recall < 1.0
    assert rows[64].n_caught == n_truth and rows[64].recall == 1.0
    assert rows[256].recall == 1.0


def test_dfcap_recall_audit_full_recall_on_shipped_fixture(spark, qs):
    """The stated bound the driver record evidences: on the shipped
    fixtures the planted exact-copy dups share every shingle of their
    source doc — including its rare ones — so df-capped candidate
    generation catches ALL ground-truth pairs at every audited cap."""
    rows = qs["dedup_dfcap_recall_audit"].fn(spark, SF).collect()
    assert {r.max_df for r in rows} == {16, 64, 256}
    for r in rows:
        assert r.n_truth_pairs > 0
        assert r.n_caught == r.n_truth_pairs
        assert r.recall == 1.0


# --------------------------- 2. seeded phash is driver-grain non-vacuous
def test_phash_seeded_nonempty_on_shipped_fixture(spark, qs):
    rows = qs["multimodal_phash_neardup_seeded"].fn(spark, SF).collect()
    assert len(rows) > 0, "seeded corpus must yield Hamming<=2 pairs"
    # every planted pair is an exact copy: the banded join must emit it
    # with hamming == 0 and the shifted-id convention intact
    planted = [r for r in rows if r.id_b == r.id_a + 1_000_000]
    assert planted, "planted exact-copy pairs must be present"
    assert all(r.hamming == 0 for r in planted)


# ---------------------- 3. selectivity compare names its truth bound
def test_selectivity_compare_schema_names_truth_bound(spark, qs):
    df = qs["dedup_candidate_selectivity_compare"].fn(spark, SF)
    assert "truth_max_df" in df.columns
    rows = {r.method: r for r in df.collect()}
    assert set(rows) == {"exact_hash", "minhash_lsh", "simhash_banded"}
    # exact row never touches the truth table: bound reported as 0
    assert rows["exact_hash"].truth_max_df == 0
    assert rows["exact_hash"].n_verified == rows["exact_hash"].n_candidates
    for m in ("minhash_lsh", "simhash_banded"):
        assert rows[m].truth_max_df == 64
        assert 0 <= rows[m].n_verified <= rows[m].n_candidates
    # planted dups guarantee each generator catches something
    assert rows["minhash_lsh"].n_verified > 0
    assert rows["simhash_banded"].n_verified > 0


# ----------------------- 4. dfcap budget planner prices caps exactly
def test_dfcap_budget_planner_exact_on_known_corpus(spark, tmp_path, qs):
    """Hand-computable corpus: 3 copies of one text (plus the planted
    dup of doc 0 => 4 copies) and one unique doc. Every shingle of the
    repeated text has df=4 (6 pairs each); the unique doc's shingles
    have df=1 (0 pairs). The planner must report these EXACT counts at
    every cap, monotone in the cap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["a b c d e", "a b c d e", "a b c d e", "p q r s"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {
        r.max_df: r
        for r in qs["dedup_dfcap_budget_planner"]
        .fn(spark, str(tmp_path))
        .orderBy("max_df")
        .collect()
    }
    assert set(rows) == {4, 16, 64, 256, 1024}
    # corpus after planted dup of doc 0: 4x "a b c d e" + 1x "p q r s"
    # shingles: {a b c, b c d, c d e} df=4 each; {p q r, q r s} df=1 each
    # cap 4 retains everything: 5 shingles, 4*3+1*2 = 14 occurrences,
    # pairs = 3 * C(4,2) = 18
    for c in (4, 16, 64, 256, 1024):
        r = rows[c]
        assert r.n_shingles_under_cap == 5
        assert r.frac_shingles == 1.0
        assert r.n_occurrences_under_cap == 14
        assert r.frac_occurrences == 1.0
        assert r.candidate_pairs_bound == 18
    # monotonicity invariant on a real fixture (non-degenerate df mix)
    sf_rows = (
        qs["dedup_dfcap_budget_planner"].fn(spark, SF).orderBy("max_df").collect()
    )
    for a, b in zip(sf_rows, sf_rows[1:]):
        assert a.n_shingles_under_cap <= b.n_shingles_under_cap
        assert a.n_occurrences_under_cap <= b.n_occurrences_under_cap
        assert a.candidate_pairs_bound <= b.candidate_pairs_bound
        assert 0.0 <= a.frac_shingles <= b.frac_shingles <= 1.0
