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
