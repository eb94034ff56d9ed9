"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value hash (values stringified with float
normalization). Usage:

    python tools/compare.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402


def norm_value(v) -> str:
    # Driver-strict stringification: NO int-normalization of floats and no
    # precision clipping.  Rounds 1-3 proved that a lenient local gate
    # (int-normalizing floats / stringifying HUGEINT like bigint) reports
    # green while the driver's hasher reports red — values must be
    # bit-identical across engines, with dround()/CAST discipline in the
    # queries themselves, not papered over here.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


# DuckDB result-schema types that the driver's hasher stringifies
# differently from the Spark side even when values are numerically equal.
BANNED_DUCK_TYPES = {"HUGEINT", "UHUGEINT"}


def row_blob(row) -> str:
    return "|".join(norm_value(v) for v in row)


def table_digest(rows, col_order):
    blobs = sorted(row_blob([r[i] for i in col_order]) for r in rows)
    import hashlib

    return hashlib.sha256("\n".join(blobs).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from healthcare_data_lakehouse_spark.session import get_spark

    spark = get_spark("compare")
    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows ({spark_s:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue

        bad_types = [
            (c, t) for c, t in zip(d_cols, d_types) if t in BANNED_DUCK_TYPES
        ]
        if bad_types:
            print(f"FAIL {name}: oracle output has int128 columns {bad_types} "
                  "(driver hasher stringifies these differently than Spark "
                  "bigint) — CAST(... AS BIGINT) in the oracle SQL")
            failures.append(name)
            continue
        # DECIMAL on the oracle side vs double on the Spark side stringifies
        # differently ('1.50' vs '1.5') — surface the type split directly
        # instead of leaving a bare hash mismatch to diagnose
        s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        split = [
            (c, t, s_types.get(c, "?"))
            for c, t in zip(d_cols, d_types)
            if t.startswith("DECIMAL") and s_types.get(c) == "double"
        ]
        if split:
            print(f"FAIL {name}: oracle DECIMAL vs spark double {split} — "
                  "CAST the oracle column AS DOUBLE (dround_sql) or make "
                  "the Spark column decimal")
            failures.append(name)
            continue

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            s_order = [s_cols.index(c) for c in sorted(s_cols)]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            hs, hd = table_digest(s_rows, s_order), table_digest(d_rows, d_order)
            if hs != hd:
                print(f"FAIL {name}: value hash {hs} != {hd}")
                # show first diff
                sb = sorted(row_blob([r[i] for i in s_order]) for r in s_rows)
                db = sorted(row_blob([r[i] for i in d_order]) for r in d_rows)
                for a, b in zip(sb, db):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
                ok = False
        if ok:
            print(f"OK   {name}: {len(s_rows)} rows ({spark_s:.1f}s)")
        else:
            failures.append(name)

    # Tally only queries actually RUN — a filtered invocation must not count
    # skipped queries as passed (a typo'd name would otherwise print a green
    # full-catalog banner).
    print(f"\n{ran - len(failures)}/{ran} passed", end="")
    unknown = sorted(only - set(qs)) if only else []
    if unknown:
        print(f"  (UNKNOWN query names skipped: {unknown})", end="")
    print()
    return 1 if failures or unknown else 0


if __name__ == "__main__":
    raise SystemExit(main())
