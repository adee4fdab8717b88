"""Unit tests for tools/promote_verified.py's in-place registry
rewrite — the one script that edits registry.py every round.  A silent
corruption here (mis-spanned list, comment-bracket confusion, partial
removal) would desync the whole verification pipeline, so the rewrite
semantics get pinned against synthetic sources."""

import importlib.util
import json
import sys
from pathlib import Path

TOOLS = Path(__file__).resolve().parents[1] / "tools" / "promote_verified.py"

spec = importlib.util.spec_from_file_location("promote_verified", TOOLS)
pv = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pv)


SYNTH = '''"""synthetic registry"""

_DRIVER_VERIFIED_ROUNDS_AGO = [
    # round 1 verified (this comment contains a bracket ] to trap
    # text-anchored rewrites — ADVICE r7)
    "old_a", "old_b",
]

_VERIFY_FIRST = [
    # staged this round
    "q_new1",
    "q_new2", "q_stays",
]

_VERIFY_LAST = []

_VERIFY_AFTER = [
    # queued ] tricky comment
    "q_new3",
]
'''


def test_list_spans_finds_all_lists_despite_bracket_comments():
    spans = pv.list_spans(SYNTH)
    assert set(spans) == {
        "_DRIVER_VERIFIED_ROUNDS_AGO",
        "_VERIFY_FIRST",
        "_VERIFY_LAST",
        "_VERIFY_AFTER",
    }
    assert spans["_DRIVER_VERIFIED_ROUNDS_AGO"][2] == ["old_a", "old_b"]
    assert spans["_VERIFY_FIRST"][2] == ["q_new1", "q_new2", "q_stays"]
    assert spans["_VERIFY_AFTER"][2] == ["q_new3"]
    # spans point exactly at the list value expression
    for start, end, _ in spans.values():
        assert SYNTH[start] == "[" and SYNTH[end - 1] == "]"


def test_green_accepts_hash_rows_and_justified_rows_only():
    assert pv.green({"rows_match": True, "schema_match": True,
                     "hash_match": True, "spark_rows": 5, "err": None})
    # rows-only convention: err == 'no_oracle' with rows > 0
    assert pv.green({"err": "no_oracle", "spark_rows": 3})
    assert not pv.green({"err": "no_oracle", "spark_rows": 0})
    assert not pv.green({"rows_match": False, "err": None})
    assert not pv.green({"rows_match": True, "hash_match": False, "err": None})
    assert not pv.green({"rows_match": True, "err": "boom"})


def test_rewrite_promotes_and_drains_queues(tmp_path, monkeypatch, capsys):
    repo = tmp_path
    reg = repo / "registry.py"
    reg.write_text(SYNTH)
    rec = {
        "q_new1": {"rows_match": True, "schema_match": True,
                   "hash_match": True, "spark_rows": 1, "err": None},
        "q_new2": {"rows_match": True, "schema_match": True,
                   "hash_match": True, "spark_rows": 2, "err": None},
        "q_new3": {"err": "no_oracle", "spark_rows": 4},
        "q_red": {"rows_match": False, "err": None},
    }
    (repo / "CORRECTNESS_r07.json").write_text(json.dumps(rec))
    monkeypatch.setattr(pv, "REPO", str(repo))
    monkeypatch.setattr(pv, "REG", str(reg))
    monkeypatch.setattr(sys, "argv", ["promote_verified.py"])
    pv.main()
    out = reg.read_text()
    spans = pv.list_spans(out)
    # promoted: all green names appended under a round-tagged comment
    assert spans["_DRIVER_VERIFIED_ROUNDS_AGO"][2] == [
        "old_a", "old_b", "q_new1", "q_new2", "q_new3"
    ]
    assert "# round 7 verified (CORRECTNESS_r07.json)" in out
    # queues drained of promoted names only; emptied queue reset to []
    assert spans["_VERIFY_FIRST"][2] == ["q_stays"]
    assert spans["_VERIFY_AFTER"][2] == []
    # red row reported, never promoted
    assert "q_red" in capsys.readouterr().out
    assert "q_red" not in spans["_DRIVER_VERIFIED_ROUNDS_AGO"][2]
    # the rewritten file still parses and re-spans cleanly (idempotent
    # second pass finds nothing new)
    monkeypatch.setattr(sys, "argv", ["promote_verified.py", "--dry-run"])
    pv.main()
    assert "nothing to promote" in capsys.readouterr().out


def test_rewrite_refuses_missing_lists():
    import pytest

    with pytest.raises(SystemExit):
        pv.list_spans("_VERIFY_FIRST = []\n")
