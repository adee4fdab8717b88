"""Staleness-rotation staging helper (registry.py rotation policy,
VERDICT r10 item 1).

Reconciles every CORRECTNESS_r*.json into each query's LATEST official
round, then prints the N stalest names (oldest official row first,
registration order within a round) as a ready-to-paste Python list for
next round's _VERIFY_FIRST — minus anything already staged in a queue.
Changed-implementation re-verifies are a judgment call and still go in
by hand ahead of the rotation block.

Pure bookkeeping — no SparkSession is started (the registry import
only registers builders).

Usage: python tools/stage_rotation.py [--n 50] [--all]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_official_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50, help="rotation slots to fill")
    ap.add_argument("--all", action="store_true", help="print every query's vintage")
    args = ap.parse_args()

    from spark_lineage_spark.registry import (
        _VERIFY_AFTER,
        _VERIFY_FIRST,
        _VERIFY_LAST,
        QUERIES,
        load_all,
    )

    load_all()
    latest = latest_official_round()
    staged = set(_VERIFY_FIRST) | set(_VERIFY_LAST) | set(_VERIFY_AFTER)

    never = [n for n in QUERIES if n not in latest and n not in staged]
    if never:
        print(f"# WARNING: {len(never)} queries have NO official row and are "
              f"not staged: {never}\n")

    vintages = sorted(
        ((latest[n], i, n) for i, n in enumerate(QUERIES) if n in latest),
        key=lambda t: (t[0], t[1]),
    )
    if args.all:
        for rnd, _, n in vintages:
            mark = " (staged)" if n in staged else ""
            print(f"r{rnd:02d}  {n}{mark}")
        return

    pick = [n for rnd, _, n in vintages if n not in staged][: args.n]
    by_round: dict[int, int] = {}
    for rnd, _, n in vintages:
        if n in pick:
            by_round[rnd] = by_round.get(rnd, 0) + 1
    print(f"# {len(pick)} stalest unstaged queries "
          f"(vintages: {', '.join(f'r{r}:{c}' for r, c in sorted(by_round.items()))}):")
    body = ", ".join(f'"{n}"' for n in pick)
    print(textwrap.indent(textwrap.fill(body, 72), "    "))


if __name__ == "__main__":
    main()
