"""Per-query profiler for optimization round 14.

Usage: python r14/profile.py <out_tag> <query> [query ...]
  - captures .explain("formatted") to plans/r14/<query>_<out_tag>.txt
  - times N runs (cache cleared between) with a .count() action
  - counts Spark jobs per invocation via a job group
Prints one JSON line per query: {"name", "runs": [...], "median", "jobs"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RUNS = int(os.environ.get("PROFILE_RUNS", "5"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from healthcare_data_lakehouse_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("profile")
    sc = spark.sparkContext
    qs = e.queries()

    from healthcare_data_lakehouse_spark.tables import TABLE_NAMES, table
    for t in TABLE_NAMES:
        table(spark, sf_dir, t).count()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = qs[name]
        # plan dump (lazy build only)
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (plans_dir / f"{name}_{tag}.txt").write_text(plan)

        samples = []
        jobs = None
        for i in range(RUNS):
            spark.catalog.clearCache()
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            tracker = sc.statusTracker()
            jobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        med = sorted(samples)[len(samples) // 2]
        print(json.dumps({
            "name": name, "runs": samples, "median": med, "jobs": jobs,
            "exchanges": plan.count("Exchange"),
            "hashaggs": plan.count("HashAggregate"),
            "sorts": plan.count(" Sort "),
        }), flush=True)


if __name__ == "__main__":
    main()
