"""Round-start registry promotion (VERDICT r4/r6 item 1, automated).

Reads the newest CORRECTNESS_r*.json, takes every query whose official
row is green (no err; rows_match; schema/hash too when present), and
rewrites spark_lineage_spark/registry.py:

  - appends those keys to _DRIVER_VERIFIED_ROUNDS_AGO (under a
    round-tagged comment),
  - drops them from _VERIFY_FIRST / _VERIFY_LAST / _VERIFY_AFTER,
    leaving any still-unrecorded names at the head for the next round.

List locations come from the ast (exact source spans of the four list
assignments), not text anchors — a comment containing ']' or a
reordered file can no longer corrupt the rewrite (ADVICE r7). A queue
list whose names are all promoted is reset to a bare [] so stale
section comments don't linger.

Run this FIRST thing each round, before adding new queries — the
driver's ~50-row budget is asserted by test_registry_hygiene over ALL
unrecorded names, so skipping promotion blocks new registrations.

Usage: python tools/promote_verified.py [--dry-run]
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "spark_lineage_spark", "registry.py")

VERIFIED = "_DRIVER_VERIFIED_ROUNDS_AGO"
QUEUES = ("_VERIFY_FIRST", "_VERIFY_LAST", "_VERIFY_AFTER")


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


def list_spans(src: str) -> dict[str, tuple[int, int, list[str]]]:
    """(start, end, names) of each registry list's VALUE expression —
    start/end are absolute character offsets of the '[' and just past
    the ']' (ast end positions), names via literal_eval."""
    line_off = [0]
    for line in src.splitlines(keepends=True):
        line_off.append(line_off[-1] + len(line))

    def off(lineno: int, col: int) -> int:
        return line_off[lineno - 1] + col

    out = {}
    for node in ast.parse(src).body:
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id in (VERIFIED, *QUEUES)
            and isinstance(node.value, ast.List)
        ):
            v = node.value
            out[node.targets[0].id] = (
                off(v.lineno, v.col_offset),
                off(v.end_lineno, v.end_col_offset),
                [ast.literal_eval(e) for e in v.elts],
            )
    missing = {VERIFIED, *QUEUES} - set(out)
    if missing:
        raise SystemExit(f"registry lists not found via ast: {sorted(missing)}")
    return out


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
    spans = list_spans(src)
    already = set(spans[VERIFIED][2])
    new = [n for n in passed if n not in already]
    if not new:
        print("nothing to promote")
        return

    block = f"    # round {int(rnd)} verified ({os.path.basename(latest)})\n"
    for i in range(0, len(new), 3):
        block += "    " + " ".join(f'"{n}",' for n in new[i : i + 3]) + "\n"

    # edit spans back-to-front so earlier offsets stay valid
    edits = []  # (start, end, replacement)
    vstart, vend, _ = spans[VERIFIED]
    # insert just before the closing ']' (the last char of the span)
    edits.append((vend - 1, vend - 1, block))
    for lst in QUEUES:
        qstart, qend, names = spans[lst]
        remaining = [n for n in names if n not in new]
        if not remaining:
            seg = "[]"  # reset: no stale section comments in emptied queues
        else:
            seg = src[qstart:qend]
            for n in set(names) - set(remaining):
                seg = re.sub(rf'"{re.escape(n)}",\s*', "", seg)
            seg = re.sub(r"\n {4}\n", "\n", seg)  # collapse emptied lines
        edits.append((qstart, qend, seg))
    for start, end, rep in sorted(edits, reverse=True):
        src = src[:start] + rep + src[end:]

    if args.dry_run:
        print(f"dry-run: would promote {len(new)} names")
        return
    open(REG, "w").write(src)
    print(f"promoted {len(new)} names into {VERIFIED}")
    print("NOW: update test_registry_hygiene's docstring + run pytest on it")


if __name__ == "__main__":
    main()
