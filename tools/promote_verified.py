"""Round-start registry promotion (VERDICT r4/r6 item 1, automated).

Reads the newest CORRECTNESS_r*.json, takes every query whose official
row is green (no err; rows_match; schema/hash too when present), and
rewrites spark_lineage_spark/registry.py:

  - appends those keys to _DRIVER_VERIFIED_ROUNDS_AGO (under a
    round-tagged comment),
  - drops them from _VERIFY_FIRST / _VERIFY_LAST / _VERIFY_AFTER,
    leaving any still-unrecorded names at the head for the next round.

Run this FIRST thing each round, before adding new queries — the
driver's ~50-row budget is asserted by test_registry_hygiene over ALL
unrecorded names, so skipping promotion blocks new registrations.

Usage: python tools/promote_verified.py [--dry-run]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "spark_lineage_spark", "registry.py")


def green(rec: dict) -> bool:
    # rows-only records look like err='no_oracle' + null matches +
    # spark_rows > 0: the driver ran the weaker check, which still
    # counts as an official row (the registry docstring justifies it)
    if rec.get("err") == "no_oracle":
        return (rec.get("spark_rows") or 0) > 0
    if rec.get("err"):
        return False
    if not rec.get("rows_match"):
        return False
    for k in ("schema_match", "hash_match"):
        if rec.get(k) is False:
            return False
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        raise SystemExit("no CORRECTNESS_r*.json found")
    latest = files[-1]
    rnd = re.search(r"_r(\d+)\.json$", latest).group(1)
    recs = json.load(open(latest))
    passed = sorted(n for n, r in recs.items() if green(r))
    failed = sorted(n for n, r in recs.items() if not green(r))
    print(f"{os.path.basename(latest)}: {len(passed)} green, {len(failed)} not")
    if failed:
        print("  NOT promoted (fix before re-queueing):", failed)

    src = open(REG).read()
    already = set(
        re.findall(r'"([a-z0-9_]+)"', src[src.index("_DRIVER_VERIFIED_ROUNDS_AGO") :
                                          src.index("_VERIFY_FIRST")])
    )
    new = [n for n in passed if n not in already]
    if not new:
        print("nothing to promote")
        return

    # 1) append to _DRIVER_VERIFIED_ROUNDS_AGO just before its closing ]
    head, _, tail = src.partition("_DRIVER_VERIFIED_ROUNDS_AGO")
    close = head.__len__() + len("_DRIVER_VERIFIED_ROUNDS_AGO") + tail.index("]")
    block = f"    # round {int(rnd)} verified ({os.path.basename(latest)})\n"
    for i in range(0, len(new), 3):
        block += "    " + " ".join(f'"{n}",' for n in new[i : i + 3]) + "\n"
    src = src[:close] + block + src[close:]

    # 2) drop promoted names from the three queue lists
    for lst in ("_VERIFY_FIRST", "_VERIFY_LAST", "_VERIFY_AFTER"):
        start = src.index(f"{lst} = [")
        end = src.index("]", start)
        seg = src[start:end]
        for n in new:
            seg = re.sub(rf'"\b{n}\b",\s*', "", seg)
        seg = re.sub(r"\n {4}\n", "\n", seg)  # collapse emptied lines
        src = src[:start] + seg + src[end:]

    if args.dry_run:
        print(f"dry-run: would promote {len(new)} names")
        return
    open(REG, "w").write(src)
    print(f"promoted {len(new)} names into _DRIVER_VERIFIED_ROUNDS_AGO")
    print("NOW: update test_registry_hygiene's docstring + run pytest on it")


if __name__ == "__main__":
    main()
