"""Regression gate: no oracle may produce a DuckDB int128 output column.

Rounds 1-3 carried 3 chronic driver hash mismatches whose Spark/DuckDB
*values* were bit-identical — the oracle SQL's ``SUM(<integer>)`` widened
to DuckDB HUGEINT, which the driver's hasher stringifies differently from
Spark bigint.  14 of 213 oracles were affected.  This test binds (plans,
does not execute) every oracle under DuckDB and asserts the result schema
contains no HUGEINT/UHUGEINT, so a new query can't reintroduce the bug.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.oracle_types import audit  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not Path(SF_DIR).exists(), reason="driver testdata not present"
)
def test_no_int128_oracle_outputs():
    offenders, errors = audit(SF_DIR)
    assert not errors, f"oracles failed to bind under DuckDB: {errors}"
    assert not offenders, (
        "oracles with HUGEINT/UHUGEINT output columns (wrap the integer "
        f"aggregate in CAST(... AS BIGINT)): {offenders}"
    )
