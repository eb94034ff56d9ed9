"""Generate QUERIES.md — the full query/operator index — from the live
registry, so the doc can never drift from the code.

Usage: ``python tools/gen_query_docs.py``
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MODULE_TITLES = {
    "advanced": "Advanced analytics (bitmaps, changepoints, resampling, corpus laws)",
    "analytics": "Relational analytics (TPC-H shapes, windows, sets, sampling, sketches)",
    "behavior": "Behavioral & statistical analytics",
    "etl_queries": "ETL, loads, lineage, time travel",
    "llm_ops": "LLM-pipeline operators (dedup, similarity, text, multimodal)",
    "quality_queries": "Data quality & governance",
    "semistructured": "Semi-structured & array surface",
    "streaming_queries": "Structured Streaming (drained deterministic)",
}


def main() -> None:
    from healthcare_data_lakehouse_spark.queries.catalog import load_all

    by_module: dict[str, list] = defaultdict(list)
    for name, spec in sorted(load_all().items()):
        by_module[spec.fn.__module__.rsplit(".", 1)[-1]].append(spec)

    lines = [
        "# Query & operator index",
        "",
        "Auto-generated from the registry by `tools/gen_query_docs.py` — "
        "regenerate after adding queries; do not edit by hand.",
        "",
        "Every entry is runnable as `queries()[name](spark, sf_dir)`; "
        "**oracle** = verified against DuckDB by order-insensitive value "
        "hash at sf0.01, **rows-only** = engine-specific result (sketches, "
        "estimates) checked for shape.",
        "",
    ]
    total = oracle_n = 0
    for mod, specs in sorted(by_module.items()):
        lines.append(f"## {MODULE_TITLES.get(mod, mod)} ({len(specs)})")
        lines.append("")
        lines.append("| query | check | description |")
        lines.append("|---|---|---|")
        for s in specs:
            total += 1
            kind = "oracle" if s.oracle else "rows-only"
            oracle_n += s.oracle is not None
            desc = " ".join(s.description.split())
            lines.append(f"| `{s.name}` | {kind} | {desc} |")
        lines.append("")
    lines.insert(
        2,
        f"**{total} queries, {oracle_n} oracle-verified.**",
    )
    lines.insert(3, "")
    (ROOT / "QUERIES.md").write_text("\n".join(lines))
    print(f"QUERIES.md: {total} queries, {oracle_n} with oracles")


if __name__ == "__main__":
    main()
