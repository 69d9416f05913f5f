"""The driver parses bench.py's FINAL stdout line as JSON — guard
that contract (r1 lost its bench artifact to an unparseable line)."""

import json
import os
import subprocess
import sys


def test_bench_final_line_is_short_parseable_json(tmp_path):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_BENCH_DETAIL=str(tmp_path / "detail.json"))
    out = subprocess.run(
        [sys.executable, "bench.py", "wordcount", "q6_forecast_revenue"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == 2
    assert isinstance(parsed["value"], float)
    # short enough that a line-capture truncation can't bite again
    assert len(last) < 1200, len(last)


def test_headline_runs_as_dedicated_first_group():
    """Full runs must put the HEADLINE 12 in their own fixed-order
    first child group — the headline metric must not depend on
    registry ordering (r3's apparent regressions were queries moving
    between groups). Pins the grouping logic without running Spark."""
    import bench
    from distributed_system_mapreduce_spark.registry import QUERIES

    head = [n for n in bench.HEADLINE if n in QUERIES]
    assert head == bench.HEADLINE  # every headline member registered
    rest = sorted((n for n in QUERIES if n not in set(head)),
                  key=bench.stable_group_key)
    groups = [head] + [rest[i:i + bench.GROUP_SIZE]
                       for i in range(0, len(rest), bench.GROUP_SIZE)]
    # mirrors bench.main's full-run path: first group == HEADLINE
    assert groups[0] == bench.HEADLINE
    assert all(n not in set(bench.HEADLINE) for g in groups[1:]
               for n in g)
    assert sum(len(g) for g in groups) == len(QUERIES)
    # group membership is a function of the NAME alone: reordering
    # the registry (gate-prefix rotation) must not move any query
    # between groups
    shuffled = sorted((n for n in reversed(list(QUERIES))
                       if n not in set(head)),
                      key=bench.stable_group_key)
    assert shuffled == rest
