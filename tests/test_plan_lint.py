"""The plan linter gates every registered batch query: no cartesian
products, no Python in hot paths, no undeclared single-partition
ordered stages."""

from __future__ import annotations


def test_catalog_passes_plan_lint(spark, sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_lint import lint

    assert lint(spark, sf_dir) == []
