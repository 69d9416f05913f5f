"""Task-failure injection: the engine's answer to the reference's
mid-job worker failure handling (HandleFailure, maple_juice.go:739;
RellocateFiles, file_system.go:730) is Spark's own scheduler retry +
a truncating, survivable lineage barrier. local[32] cannot kill a
real executor, but local[N, maxFailures] exercises the exact
scheduler path a dying worker triggers: a reduce task that throws
mid-job is re-attempted on the same inputs and the job completes
with the correct answer — while a maxFailures=1 master (retries
disabled) aborts, proving the failure actually fired and recovery
is the scheduler's doing, not luck.

Runs in a SUBPROCESS because the test session's JVM is pinned to
local[32] (master cannot change after startup)."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import os, sys
master, flag = sys.argv[1], sys.argv[2]
sys.path.insert(0, sys.argv[3])
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master(master).appName("failure-inj")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import pandas as pd
from distributed_system_mapreduce_spark.engine.maple_juice import (
    MapleJuice, wrap_line_job)
from distributed_system_mapreduce_spark import lineage

docs = spark.createDataFrame(
    [(f"w{i % 7} w{(i * 3) % 7}",) for i in range(500)], "line string")

def map_fn(line):
    return [(w, "1") for w in line.split()]

def reduce_fn(key, grp):
    if not os.path.exists(flag):
        open(flag, "w").write("fired")
        raise RuntimeError("injected task failure")
    return pd.DataFrame({"key": [key], "value": [str(len(grp))]})

mj = MapleJuice(spark)
kv = mj.maple(docs, wrap_line_job(map_fn))
out = mj.juice(kv, reduce_fn)
try:
    # the iterative-loop barrier, in its cluster posture: the eager
    # checkpoint IS the first job, so the injected failure surfaces
    # here; the write happens only after the recovered reduce
    out = lineage.cut(out, mode="reliable")
    rows = sorted((r["key"], r["value"]) for r in out.collect())
    print("RESULT:" + ";".join(f"{k}={v}" for k, v in rows))
except Exception as ex:
    print(f"ABORTED:{type(ex).__name__}")
spark.stop()
"""


def _run(master: str, tmp_path: Path, tag: str):
    flag = tmp_path / f"flag_{tag}"
    script = tmp_path / f"inj_{tag}.py"
    script.write_text(SCRIPT)
    proc = subprocess.run(
        [sys.executable, str(script), master, str(flag), str(REPO)],
        capture_output=True, text=True, timeout=300,
        cwd=str(REPO), env={**os.environ, "SPARK_MASTER": ""})
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith(("RESULT:", "ABORTED:"))]
    assert lines, f"no outcome line:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    return lines[-1], flag.exists()


def _expected() -> str:
    from collections import Counter

    c = Counter()
    for i in range(500):
        c[f"w{i % 7}"] += 1
        c[f"w{(i * 3) % 7}"] += 1
    return "RESULT:" + ";".join(
        f"{k}={c[k]}" for k in sorted(c))


def test_injected_task_failure_recovers_with_retries(tmp_path):
    out, fired = _run("local[8,2]", tmp_path, "retry")
    assert fired, "injection never fired — test proved nothing"
    assert out == _expected(), out


def test_injected_task_failure_aborts_without_retries(tmp_path):
    """Same job, maxFailures=1: the abort proves the injection is
    real (the retry run did not just dodge the failing attempt)."""
    out, fired = _run("local[8]", tmp_path, "abort")
    assert fired
    assert out.startswith("ABORTED:"), out
