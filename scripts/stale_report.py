#!/usr/bin/env python3
"""Staleness report for the 50-slot grading rotation: for every
registry query, the last round a CORRECTNESS_r{N}.json graded it (and
whether that grading was green), plus the queue the rotation rule
implies for the next round (stalest first, registry order as the
tiebreak — the `__spark_entry__._PRIORITY` fallback order).

Every round's window planning re-derived this by hand from the
CORRECTNESS files; this makes it one command:

    python scripts/stale_report.py            # full table
    python scripts/stale_report.py --queue    # next-round queue only
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_graded() -> dict:
    """{query: (round, green)} from every CORRECTNESS_r*.json."""
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") in (True, None))
                and not row.get("err")
            )
            out[name] = (rnd, green)
    return out


def main() -> None:
    import __spark_entry__ as entry

    registry = list(entry.queries())
    graded = last_graded()
    rows = [
        (name, *graded.get(name, (0, None)))
        for name in registry
    ]
    if "--queue" in sys.argv:
        # never-graded first (round 0), then stalest, registry order
        queue = sorted(
            rows, key=lambda r: (r[1], registry.index(r[0]))
        )
        for name, rnd, green in queue:
            tag = "NEVER" if rnd == 0 else f"r{rnd}" + (
                "" if green else " RED"
            )
            print(f"{name}\t{tag}")
        return
    from collections import Counter

    by_round = Counter(r[1] for r in rows)
    print("last-graded round histogram:", dict(sorted(by_round.items())))
    red = [r for r in rows if r[2] is False]
    if red:
        print("NOT GREEN at last grading:", [r[0] for r in red])
    never = [r[0] for r in rows if r[1] == 0]
    if never:
        print("never graded:", never)


if __name__ == "__main__":
    main()
