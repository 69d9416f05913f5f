"""tools/scaling_curve.py artifact writer: every write path must
PRESERVE foreign top-level panels (skew, lineage_posture, ...).

Regression for VERDICT r8 item 2: the full-run write path dumped a
fresh document and destroyed the measured skew and lineage_posture
panels the same artifact carried."""

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_spec = importlib.util.spec_from_file_location(
    "scaling_curve", REPO / "tools" / "scaling_curve.py")
scaling_curve = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(scaling_curve)


def _seed(path: Path) -> dict:
    doc = {
        "base": "/old/base",
        "floor_sec": 0.35,
        "multipliers": [1, 2, 5, 10],
        "queries": {"old_q": {"t1": 1.0, "t10": 9.0,
                              "multipliers": [1, 10]}},
        "skew": {"alpha": 1.1, "join_salted_t10": 2.0},
        "lineage_posture": {"multiplier": 10, "queries": {}},
        "some_future_panel": {"x": 1},
    }
    path.write_text(json.dumps(doc))
    return doc


def test_full_run_write_preserves_foreign_panels(tmp_path):
    out = tmp_path / "SCALING.json"
    seed = _seed(out)
    fresh = {"new_q": {"t1": 0.5, "t10": 4.0, "multipliers": [1, 10]}}
    scaling_curve.write_doc(str(out), (1, 10), fresh, merge_queries=False)
    got = json.loads(out.read_text())
    # foreign panels intact
    assert got["skew"] == seed["skew"]
    assert got["lineage_posture"] == seed["lineage_posture"]
    assert got["some_future_panel"] == seed["some_future_panel"]
    # full run REPLACES the queries table and restamps the metadata
    assert got["queries"] == fresh
    assert got["multipliers"] == [1, 10]


def test_subset_write_merges_rows_and_preserves_panels(tmp_path):
    out = tmp_path / "SCALING.json"
    seed = _seed(out)
    fresh = {"new_q": {"t1": 0.5, "t10": 4.0, "multipliers": [1, 10]}}
    scaling_curve.write_doc(str(out), (1, 10), fresh, merge_queries=True)
    got = json.loads(out.read_text())
    assert got["skew"] == seed["skew"]
    assert got["lineage_posture"] == seed["lineage_posture"]
    # spot re-run keeps the stale row alongside the fresh one
    assert set(got["queries"]) == {"old_q", "new_q"}
    assert got["queries"]["old_q"]["multipliers"] == [1, 10]
