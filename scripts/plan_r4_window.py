"""Print the round-4 registry ordering plan.

The driver's correctness harness emits rows for the FIRST 50
`queries()` entries only, so each round the never-driver-verified
entries must occupy the front of the registry. This script computes
that ordering mechanically from the shipped CORRECTNESS_r*.json files
plus the staging module, so the round-4 merge is a copy-paste, not a
judgment call:

  1. every `_r4_staging.queries_r4()` entry (none has ever had a
     driver row), in staging order;
  2. any registry entry STILL without a row in any shipped
     CORRECTNESS file (should be empty after the r3 driver run);
  3. everything else in current registry order.

Run:  python scripts/plan_r4_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import _r4_staging as staging
    import __spark_entry__ as entry

    staged = list(staging.queries_r4())
    registry = list(entry.queries())
    overlap = set(staged) & set(registry)
    assert not overlap, f"staged names already registered: {sorted(overlap)}"

    seen: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        seen.update(json.load(open(path)))
    never = [q for q in registry if q not in seen]
    rest = [q for q in registry if q in seen]

    order = staged + never + rest
    window = order[:50]
    print(f"# staged (never driver-run): {len(staged)}")
    print(f"# registry entries still unseen in CORRECTNESS_r*: {len(never)}")
    print(f"# total after merge: {len(order)}; window holds:")
    for i, name in enumerate(window, 1):
        tag = "staged" if name in staged else ("unseen" if name in never else "verified")
        print(f"{i:3d}. {name}  [{tag}]")
    spill = len(staged) + len(never) - 50
    if spill > 0:
        print(f"# WARNING: {spill} never-verified entries fall outside the "
              "window — they need a second round, list order above decides")


if __name__ == "__main__":
    main()
