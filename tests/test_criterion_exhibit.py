"""Pure-python tests for the scaling-criterion exhibit renderer.

The exhibit is the round-6 deliverable for the BASELINE scaling gate —
its tables must be regenerable from the ladder JSONs without hand-editing,
and the clean-leg filtering must never let an unstamped attempt into the
headline numbers.  No Spark session involved.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "criterion_exhibit", os.path.join(REPO, "tools", "criterion_exhibit.py"))
ce = importlib.util.module_from_spec(spec)
sys.modules["criterion_exhibit"] = ce
spec.loader.exec_module(ce)


def _leg(cpus, wall, tps, clean=True, n_turns=30_609_983):
    return {"cpus": cpus, "wall_s": wall, "turns_per_sec": tps,
            "n_turns": n_turns, "clean": clean}


def test_strong_table_counts_only_clean_samples():
    rec = {
        "best_clean": {"1": _leg(1, 100.0, 300_000.0)},
        "attempts": {"1": [_leg(1, 100.0, 300_000.0),
                           _leg(1, 90.0, 340_000.0, clean=False),
                           {"cpus": 1, "wall_s": 80.0,
                            "turns_per_sec": 400_000.0,
                            "n_turns": 30_609_983}]},  # unstamped pre-r6
    }
    lines = ce.strong_table(rec)
    row = [ln for ln in lines if ln.startswith("| local[1]")][0]
    # one clean sample; the dirty and unstamped attempts must not count
    assert "| 1 |" in row
    assert "300k" in row


def test_weak_pairs_efficiency_is_wall_ratio():
    rec = {"best_clean": {"1": _leg(1, 40.0, 190_000.0, n_turns=7_650_000),
                          "4": _leg(4, 50.0, 612_000.0, n_turns=30_600_000)},
           "attempts": {}}
    lines = ce.weak_pairs_table(rec)
    row = [ln for ln in lines if ln.startswith("| 1→4")][0]
    assert "0.800" in row  # 40.0 / 50.0
    missing = [ln for ln in lines if ln.startswith("| 2→8")][0]
    assert "missing clean leg" in missing


def test_marker_roundtrip(tmp_path, monkeypatch):
    baseline = tmp_path / "BENCH" / "BASELINE.md"
    baseline.parent.mkdir()
    baseline.write_text(
        f"# head\n\n{ce.MARK_START}\nOLD GENERATED CONTENT\n{ce.MARK_END}\n\ntail prose\n")
    monkeypatch.setattr(ce, "REPO", str(tmp_path))
    assert ce.write_into_baseline("NEW TABLES")
    text = baseline.read_text()
    assert "NEW TABLES" in text
    assert "OLD GENERATED CONTENT" not in text
    # prose outside the markers untouched
    assert text.startswith("# head")
    assert "tail prose" in text
    # idempotent: a second write keeps exactly one marker pair
    assert ce.write_into_baseline("NEWER")
    text2 = baseline.read_text()
    assert text2.count(ce.MARK_START) == 1 and text2.count(ce.MARK_END) == 1
    assert "NEWER" in text2 and "NEW TABLES" not in text2


def test_missing_markers_is_refused(tmp_path, monkeypatch):
    baseline = tmp_path / "BENCH" / "BASELINE.md"
    baseline.parent.mkdir()
    baseline.write_text("# no markers here\n")
    monkeypatch.setattr(ce, "REPO", str(tmp_path))
    assert not ce.write_into_baseline("TABLES")
    assert baseline.read_text() == "# no markers here\n"
