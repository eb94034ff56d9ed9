"""Scale-exponent spot-bench (VERDICT r10 ask #1).

Times the 25 heaviest sf0.1 headline queries (per the committed r10 driver
record), 5 linear-control scan queries, and the 11 write-bench entries at
two scale factors — a generated sf0.1 twin and a generated sf1.0 (both from
tools/gen_scale_fixture.py, same generator on both sides so the ratio is
pure data growth, not generator drift) — and records measured time ratios
against the 10x data growth.

Protocol: one Spark session, untimed warm-up scan of every table at both
SFs, then per (query, sf) the median of N end-to-end runs (plan + execute +
count, cache cleared between runs). Results append to SCALE_BENCH.json
after every query so a crash or timeout loses nothing; re-running skips
already-measured pairs.

Usage:
  python tools/gen_scale_fixture.py 0.1 /tmp/scale_sf0.1
  python tools/gen_scale_fixture.py 1.0 /tmp/scale_sf1.0
  python tools/scale_bench.py [--runs 3] [--small /tmp/scale_sf0.1]
                              [--big /tmp/scale_sf1.0] [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / "SCALE_BENCH.json"

# The 25 heaviest read-only headline queries at sf0.1, frozen from the r10
# driver bench record (BENCH_r10.json tail, sorted by median wall).
HEAVY_25 = [
    "graph_khop_expansion_profile",
    "graph_adamic_adar_link_prediction",
    "graph_modularity_supplier_nations",
    "dedup_candidate_selectivity_compare",
    "assoc_part_pairs_lift",
    "graph_hits_hubs_authorities",
    "quality_validate_silver",
    "dedup_bcubed_cluster_eval",
    "dedup_prefix_filter_jaccard",
    "graph_degree_assortativity_coparts",
    "etl_length_of_stay_profile",
    "graph_pagerank_neardup",
    "dedup_transitive_closure_sql",
    "quality_consistency_rule_discharge",
    "graph_kcore_supplier_coorder",
    "transform_dedup_first_wins",
    "dedup_clusters_star",
    "sketch_hll_audience_overlap",
    "graph_supplier_copart_pairs",
    "graph_label_propagation_communities",
    "dedup_duplicate_clusters",
    "graph_clustering_coefficient_neardup",
    "dedup_simhash_block_index",
    "text_ngram_novelty_rate",
    "load_merge_full_clauses",
]

# Scan-shaped controls expected to scale ~linearly: they anchor the
# measurement (if a control comes out superlinear, the harness — not the
# query — is suspect: spill, GC, partition-count effects).
LINEAR_CONTROLS = [
    "tpch_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "text_quality_scores",
    "gold_revenue_by_mktsegment",
    "events_sessionization",
]

# Write-path / streaming representatives (bench.py WRITE_HEADLINE).
WRITE_11 = [
    "load_cdf_replication_apply",
    "load_bloom_index_point_lookup",
    "load_delete_where",
    "load_restore_version",
    "storage_compact_vacuum_audit",
    "etl_run_job_silver",
    "etl_quarantine_split",
    "streaming_left_outer_interval_join",
    "streaming_neardup_admission_gate",
    "streaming_sliding_topk_event_types",
    "streaming_quality_admission_gate",
]


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def fit_exponent(points: list[tuple[float, float]]) -> float | None:
    """Least-squares slope of ln(t) vs ln(sf) — the scale exponent
    (VERDICT r11 ask #3: a two-point ratio can hide superlinear onset;
    three points expose curvature). 1.0 = linear; <=~1.1 passes."""
    import math

    pts = [(sf, t) for sf, t in points if t and t > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(sf) for sf, _ in pts]
    ys = [math.log(t) for _, t in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--small", default="/tmp/scale_sf0.1")
    ap.add_argument("--big", default="/tmp/scale_sf1.0")
    ap.add_argument("--third", default=None,
                    help="optional third scale point dir (e.g. sf3.0 "
                         "fixture) — adds t_third and a fitted exponent")
    ap.add_argument("--third-sf", type=float, default=3.0)
    ap.add_argument("--out", default=str(OUT),
                    help="record file (use a separate file for "
                         "open-vocabulary fixture runs so the closed-"
                         "vocab record stays comparable across rounds)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from healthcare_data_lakehouse_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("scale_bench")
    qs = e.queries()

    out_path = Path(args.out)
    names = args.names or (HEAVY_25 + LINEAR_CONTROLS + WRITE_11)
    results: dict = (
        json.loads(out_path.read_text())
        if out_path.exists()
        else {"queries": {}}
    )
    results.setdefault("meta", {})
    results["meta"].update(
        {"runs": args.runs, "small": args.small, "big": args.big,
         "data_ratio": 10.0}
    )
    if args.third:
        results["meta"]["third"] = args.third
        results["meta"]["third_sf"] = args.third_sf

    from healthcare_data_lakehouse_spark.tables import TABLE_NAMES, table

    point_dirs = [args.small, args.big] + ([args.third] if args.third else [])
    for d in point_dirs:
        for t in TABLE_NAMES:
            table(spark, d, t).count()

    points = [("t_small", args.small, 0.1), ("t_big", args.big, 1.0)]
    if args.third:
        points.append(("t_third", args.third, args.third_sf))

    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in catalog", flush=True)
            continue
        rec = results["queries"].setdefault(name, {})
        for key, d, _sf in points:
            if key in rec:
                continue
            samples = []
            try:
                for _ in range(args.runs):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    fn(spark, d).count()
                    samples.append(time.time() - t0)
                rec[key] = round(median(samples), 3)
            except Exception as ex:  # noqa: BLE001
                rec[f"{key}_error"] = (
                    f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
                )
            if "t_small" in rec and "t_big" in rec:
                rec["ratio"] = round(rec["t_big"] / max(rec["t_small"], 1e-9), 2)
            exp = fit_exponent(
                [(sf, rec.get(k)) for k, _d, sf in points if k in rec]
            )
            if exp is not None and "t_third" in rec:
                rec["exponent"] = exp
            out_path.write_text(json.dumps(results, indent=1))
            print(f"{name} {key}: {rec.get(key, rec.get(f'{key}_error'))}",
                  flush=True)

    done = {n: r for n, r in results["queries"].items() if "ratio" in r}
    print(f"\n{len(done)} measured; ratios (t_sf1.0 / t_sf0.1, data 10x):")
    for n, r in sorted(done.items(), key=lambda kv: -kv[1]["ratio"]):
        third = (
            f" -> {r['t_third']:8.3f}s@sf3 exp={r.get('exponent')}"
            if "t_third" in r else ""
        )
        print(f"  {r['ratio']:6.2f}x  {r['t_small']:7.3f}s -> "
              f"{r['t_big']:8.3f}s{third}  {n}")


if __name__ == "__main__":
    main()
