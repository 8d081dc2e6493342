#!/usr/bin/env python3
"""Staleness report for the 50-slot grading rotation: for every
registry query, the last round a CORRECTNESS_r{N}.json graded it (and
whether that grading was green), plus the queue the rotation rule
implies for the next round (stalest first, registry order as the
tiebreak — the `__spark_entry__._PRIORITY` fallback order).

Every round's window planning re-derived this by hand from the
CORRECTNESS files; this makes it one command:

    python scripts/stale_report.py            # per-query table + summary
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
    """{query: (round, green)} from every CORRECTNESS_r*.json —
    max-round wins explicitly (never rely on glob/filename order:
    CORRECTNESS_r100 would sort before r11 lexicographically)."""
    out = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            if rnd < out.get(name, (0, None))[0]:
                continue
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") in (True, None))
                and not row.get("err")
            )
            out[name] = (rnd, green)
    return out


def _tag(rnd: int, green) -> str:
    if rnd == 0:
        return "NEVER"
    return f"r{rnd}" + ("" if green else " RED")


def main() -> None:
    import __spark_entry__ as entry

    registry = list(entry.queries())
    graded = last_graded()
    # rows carry registry order; rounds ascend via a STABLE sort, so
    # equal-round ties keep registry order (the _PRIORITY fallback)
    rows = [(name, *graded.get(name, (0, None))) for name in registry]
    queue = sorted(rows, key=lambda r: r[1])
    if "--queue" in sys.argv:
        for name, rnd, green in queue:
            print(f"{name}\t{_tag(rnd, green)}")
        return
    width = max(len(n) for n in registry)
    for name, rnd, green in queue:
        print(f"{name:<{width}}  {_tag(rnd, green)}")
    from collections import Counter

    by_round = Counter(r[1] for r in rows)
    print("\nlast-graded round histogram:", dict(sorted(by_round.items())))
    red = [r[0] for r in rows if r[2] is False]
    if red:
        print("NOT GREEN at last grading:", red)
    never = [r[0] for r in rows if r[1] == 0]
    if never:
        print("never graded:", never)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing the pipe is normal use
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
