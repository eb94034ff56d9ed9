"""Audit oracle SQL output types under DuckDB.

The driver's value hasher stringifies DuckDB HUGEINT (int128) differently
from Spark bigint, so any oracle whose result schema contains HUGEINT /
UHUGEINT will hash-mismatch even when values are identical.  DuckDB widens
``SUM(<integer>)`` to HUGEINT by default, so every integer aggregate in an
oracle must be wrapped ``CAST(... AS BIGINT)``.

Usage::

    python tools/oracle_types.py [sf_dir]

Prints one line per offending oracle with the offending column names and
exits non-zero if any are found.  Binding only — the queries are planned,
not executed, so this is fast.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

BAD_TYPES = {"HUGEINT", "UHUGEINT"}

#: The catalog convention is doubles everywhere (pinned via dround); a
#: DECIMAL oracle output stringifies with trailing zeros ('1.50') that a
#: Spark double never prints, so it is banned as an output type too.
BAD_PREFIXES = ("DECIMAL",)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def audit(sf_dir: str = "/root/testdata/sf0.001"):
    """Return {query_name: [(col, type), ...]} for oracles with int128 output."""
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    offenders = {}
    errors = {}
    for name, sql in e.oracle_sql().items():
        try:
            rel = con.sql(sql)
            bad = [
                (col, str(typ))
                for col, typ in zip(rel.columns, rel.types)
                if str(typ) in BAD_TYPES
                or str(typ).startswith(BAD_PREFIXES)
            ]
        except Exception as ex:  # binding failure is its own bug
            errors[name] = str(ex).splitlines()[0]
            continue
        if bad:
            offenders[name] = bad
    return offenders, errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    offenders, errors = audit(sf_dir)
    for name, cols in sorted(offenders.items()):
        print(f"HUGEINT {name}: {cols}")
    for name, err in sorted(errors.items()):
        print(f"BIND-ERROR {name}: {err}")
    print(f"\n{len(offenders)} oracles with int128 output, {len(errors)} bind errors")
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
