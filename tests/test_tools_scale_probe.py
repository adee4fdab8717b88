"""Unit tests for tools/scale_probe.py's subset-mode SCALE.md patcher
(round 12): replacing an existing row must not disturb neighbors, new
rows must insert after the last 10x-table row (never into the 100x
section, whose rows have a different column count), and the main
regeneration path must stay untouched."""

import importlib.util
from pathlib import Path

TOOLS = Path(__file__).resolve().parents[1] / "tools" / "scale_probe.py"
spec = importlib.util.spec_from_file_location("scale_probe", TOOLS)
sp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sp)

SYNTH = """# SCALE — empirical 10× scaling probe

header prose.

| query | base s | 10x s | ratio | base rows | 10x rows |
|---|---|---|---|---|---|
| op_alpha | 1.00 | 9.00 | 9.0 | 10 | 100 |
| op_beta | 2.00 | 8.00 | 4.0 | 20 | 200 |

Notes:
- a note line.

## 100x section (hand-measured)

| query | base s | 100x s | ratio | note |
|---|---|---|---|---|
| op_alpha | 1.00 | 95.00 | 95.0 | hand row must not move |
"""


_patch = sp.patch_rows


def test_replacing_existing_row_keeps_neighbors_and_100x_section():
    out = _patch(SYNTH, [("op_beta", 2.5, 7.5, 3.0, 20, 200)])
    assert "| op_beta | 2.50 | 7.50 | 3.0 | 20 | 200 |" in out
    assert "| op_alpha | 1.00 | 9.00 | 9.0 | 10 | 100 |" in out
    # the 100x hand row is untouched (different column count)
    assert "| op_alpha | 1.00 | 95.00 | 95.0 | hand row must not move |" in out
    assert out.count("op_beta") == 1


def test_new_row_inserts_after_last_10x_row_not_in_100x_table():
    out = _patch(SYNTH, [("op_gamma", 0.5, 4.5, 9.0, 5, 50)])
    lines = out.splitlines()
    gi = next(i for i, l in enumerate(lines) if "op_gamma" in l)
    bi = next(i for i, l in enumerate(lines) if l.startswith("| op_beta"))
    ni = next(i for i, l in enumerate(lines) if l.startswith("Notes:"))
    hi = next(i for i, l in enumerate(lines) if "## 100x" in l)
    assert bi < gi < ni < hi
    # the 100x table did not grow
    assert sum("95.00" in l for l in lines) == 1


def test_mixed_replace_and_insert():
    out = _patch(
        SYNTH,
        [("op_alpha", 1.1, 9.9, 9.0, 10, 100), ("op_new", 3.0, 30.0, 10.0, 1, 10)],
    )
    assert "| op_alpha | 1.10 | 9.90 | 9.0 | 10 | 100 |" in out
    assert "| op_new | 3.00 | 30.00 | 10.0 | 1 | 10 |" in out
    # replace did not ALSO insert a duplicate
    assert out.count("| op_alpha | 1.10") == 1
