"""Bench coverage is a closed partition of the catalog (VERDICT r9 #1).

Every catalog query must be in exactly one of:
  - the derived read-only headline set (timed),
  - WRITE_HEADLINE (timed separately), or
  - EXCLUDED_WITH_REASON (untimed, reason required).
A new query therefore lands in the bench by default; excluding it takes
an explicit reason, and stale names in either curated set fail here.
No Spark session needed — this is pure set algebra over the registry.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from healthcare_data_lakehouse_spark.queries.catalog import load_all  # noqa: E402


def _catalog_names() -> list[str]:
    return list(load_all())


def test_catalog_is_partitioned_across_bench_sets():
    names = set(_catalog_names())
    write = set(bench.WRITE_HEADLINE)
    excluded = set(bench.EXCLUDED_WITH_REASON)
    headline = set(bench.headline_names(_catalog_names()))

    # no stale curated names
    assert write <= names, f"stale WRITE_HEADLINE: {sorted(write - names)}"
    assert excluded <= names, (
        f"stale EXCLUDED_WITH_REASON: {sorted(excluded - names)}"
    )
    # curated sets are disjoint
    assert not (write & excluded), sorted(write & excluded)
    # the three sets cover the catalog exactly once
    assert headline | write | excluded == names
    assert not (headline & write)
    assert not (headline & excluded)


def test_every_exclusion_has_a_reason():
    for name, reason in bench.EXCLUDED_WITH_REASON.items():
        assert isinstance(reason, str) and reason.strip(), name


def test_sentinels_are_timed_headline_queries():
    headline = set(bench.headline_names(_catalog_names()))
    for name, ref in bench.SENTINEL_REF.items():
        assert name in headline, f"sentinel {name} not in headline set"
        # bench.py divides measured time by the ref, so a None or
        # non-positive entry would crash the summary after all timing
        # work is done (ADVICE r10): require a strictly positive number.
        assert isinstance(ref, (int, float)) and not isinstance(ref, bool)
        assert ref > 0, f"sentinel {name} ref must be > 0, got {ref!r}"


def test_committed_bench_record_has_bounded_dispersion():
    """VERDICT r11 ask #2: the committed BENCH_FULL.json must carry
    per-query [min, median, max] across the runs, internally consistent
    and with bounded dispersion — a record captured on a loaded machine
    (wild spreads) must not be committed as the round's reference, since
    movers are judged against it."""
    import json

    rec = json.loads((Path(__file__).resolve().parent.parent
                      / "BENCH_FULL.json").read_text())
    spread = rec.get("queries_spread")
    assert spread, "BENCH_FULL.json must record [min, med, max] (r12+)"
    qts = rec["queries"]
    assert set(spread) == set(qts)
    ratios = []
    for n, (lo, med, hi) in spread.items():
        assert 0 < lo <= med <= hi, n
        assert med == qts[n], n
        if lo >= 0.05:  # sub-50ms queries are timer-noise dominated
            ratios.append(hi / lo)
    ratios.sort()
    assert ratios, "no queries above the 50ms timer-noise floor"
    med_disp = ratios[len(ratios) // 2]
    # median max/min across the catalog: an idle local[32] run sits well
    # under 1.5x; a loaded machine blows past it
    assert med_disp <= 1.5, f"median dispersion {med_disp:.2f}"
    wild = sum(1 for r in ratios if r > 4.0) / len(ratios)
    assert wild <= 0.05, f"{wild:.1%} of queries have >4x spread"

    wspread = rec.get("write_queries_spread")
    assert wspread and set(wspread) == set(rec["write_queries"])
    for n, (lo, med, hi) in wspread.items():
        assert 0 < lo <= med <= hi, n
