"""SURVEY.md §8.2–8.3 and QUERIES.md are generated from the registry and
pinned here (VERDICT r10 ask #5): regeneration at test time must be a
no-op, and every registry name must appear in the generated SURVEY
section — so the blueprint document can never drift from the catalog.
Pure string/set checks, no Spark session.
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import gen_query_docs  # noqa: E402
from healthcare_data_lakehouse_spark.queries.catalog import load_all  # noqa: E402


def _by_module():
    by_module = defaultdict(list)
    for name, spec in sorted(load_all().items()):
        by_module[spec.fn.__module__.rsplit(".", 1)[-1]].append(spec)
    return by_module


def test_survey_section_is_fresh():
    survey = (ROOT / "SURVEY.md").read_text()
    cut = survey.index(gen_query_docs.SURVEY_MARK)
    assert survey[cut:] == gen_query_docs.survey_section(_by_module()), (
        "SURVEY.md §8.2+ is stale — run `python tools/gen_query_docs.py`"
    )


def test_survey_names_match_registry_exactly():
    survey = (ROOT / "SURVEY.md").read_text()
    section = survey[survey.index(gen_query_docs.SURVEY_MARK):]
    doc_names = set(re.findall(r"`([a-z0-9_]+)`", section))
    registry = set(load_all())
    # every registry name must appear; no stale query-shaped name may
    # linger (file/tool references in the preamble contain "/" or "." so
    # the bare-snake-case regex never captures them).
    assert registry <= doc_names, sorted(registry - doc_names)[:10]
    assert doc_names <= registry, sorted(doc_names - registry)[:10]


def test_queries_md_is_fresh():
    text = (ROOT / "QUERIES.md").read_text()
    registry = load_all()
    doc_names = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    assert doc_names == set(registry), (
        "QUERIES.md is stale — run `python tools/gen_query_docs.py`; "
        f"missing={sorted(set(registry) - doc_names)[:5]} "
        f"stale={sorted(doc_names - set(registry))[:5]}"
    )
