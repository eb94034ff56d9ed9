"""Driver-window rotation audit (VERDICT r11/r12 ask: keep rotating the
window into never-sampled territory, mechanically checked).

Reports, without starting Spark:
- window composition: the PRIORITY prefix vs the driver's 50-slot sample
- how many window names are FIRST-TIME (absent from every committed
  CORRECTNESS_r*.json)
- the remaining never-sampled tail, grouped by family prefix, so the next
  rotation can be picked from data instead of memory

Usage: ``python tools/window_audit.py``
"""

from __future__ import annotations

import glob
import json
import re
from collections import Counter
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
WINDOW = 50


def catalog_names() -> list[str]:
    names = []
    for f in sorted(glob.glob(str(ROOT / "healthcare_data_lakehouse_spark/queries/*.py"))):
        names += re.findall(r'register\(\s*[\'"]([\w]+)[\'"]', Path(f).read_text())
    return sorted(set(names))


def priority_names() -> list[str]:
    src = (ROOT / "healthcare_data_lakehouse_spark/queries/catalog.py").read_text()
    return re.findall(r'^    "([\w]+)",$', src, re.M)


def sampled_names() -> set[str]:
    sampled: set[str] = set()
    for f in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        sampled.update(json.loads(Path(f).read_text()).keys())
    return sampled


def main() -> None:
    cat = catalog_names()
    pri = priority_names()
    sampled = sampled_names()

    missing = [n for n in pri if n not in cat]
    dupes = [n for n, c in Counter(pri).items() if c > 1]
    first_time = [n for n in pri if n not in sampled]
    never = [n for n in cat if n not in sampled and n not in pri]

    print(f"catalog: {len(cat)} queries")
    print(f"PRIORITY prefix: {len(pri)} (driver samples first {WINDOW})")
    print(f"  missing from catalog: {missing or 'none'}")
    print(f"  duplicates: {dupes or 'none'}")
    print(f"  first-time in window: {len(first_time)}")
    print(f"never-sampled tail (excluding current window): {len(never)}")
    fams = Counter(n.split("_")[0] for n in never)
    for fam, c in fams.most_common():
        members = [n for n in never if n.split("_")[0] == fam]
        print(f"  {fam:12s} {c:3d}  {', '.join(members[:4])}"
              + (" ..." if c > 4 else ""))
    # non-zero exit if the window is malformed, so CI-style use can gate
    if missing or dupes or len(pri) != WINDOW:
        raise SystemExit(f"window malformed: len={len(pri)} "
                         f"missing={missing} dupes={dupes}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped through `head`
        pass
