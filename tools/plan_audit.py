"""Bulk plan audit: for every registered query, build its DataFrame at
the audit SF and record Exchange / ReusedExchange / parquet-scan /
Python-eval node counts from the formatted physical plan. Queries
whose plan scans the same table many times are replayed-subtree
suspects (guide §2.4 / §7.2). Writes one JSON line per query to
plans/<round>/plan_audit.jsonl and prints the suspects.

Usage: python tools/plan_audit.py [sf_dir] [round_tag]
(round_tag default r11; paths are anchored to the repo root, so the
script works from any cwd)
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    round_tag = sys.argv[2] if len(sys.argv) > 2 else "r11"
    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    spark = get_spark("plan_audit")
    out_dir = os.path.join(_REPO, "plans", round_tag)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "plan_audit.jsonl")
    rows = []
    with open(out_path, "w") as fh:
        for name, fn in QUERIES.items():
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
            except Exception as e:  # noqa: BLE001 - audit must not die
                fh.write(json.dumps({"query": name,
                                     "error": str(e)[:200]}) + "\n")
                continue
            tables: dict[str, int] = {}
            for m in re.finditer(r"InMemoryFileIndex \[[^]]*/(\w+)\.parquet",
                                 plan):
                tables[m.group(1)] = tables.get(m.group(1), 0) + 1
            rec = {
                "query": name,
                "exchange": len(re.findall(r"\n\(\d+\) Exchange", plan)),
                "reused_exchange": len(
                    re.findall(r"ReusedExchange", plan)) // 2,
                "bcast": len(re.findall(
                    r"\n\(\d+\) BroadcastExchange", plan)),
                "scans": tables,
                "py_eval": len(re.findall(
                    r"BatchEvalPython|ArrowEvalPython", plan)),
                "smj": len(re.findall(r"\n\(\d+\) SortMergeJoin", plan)),
                "window": len(re.findall(r"\n\(\d+\) Window\b", plan)),
            }
            rows.append(rec)
            fh.write(json.dumps(rec) + "\n")
    print(f"wrote {out_path} ({len(rows)} plans)")
    print("\nreplayed-scan suspects (same table scanned >= 3x):")
    for r in rows:
        worst = max(r["scans"].values(), default=0)
        if worst >= 3:
            print(f"  {r['query']:36s} scans={r['scans']} "
                  f"exch={r['exchange']} reuse={r['reused_exchange']}")
    print("\nmost exchanges:")
    for r in sorted(rows, key=lambda r: -r["exchange"])[:15]:
        print(f"  {r['query']:36s} exch={r['exchange']} "
              f"reuse={r['reused_exchange']} scans={sum(r['scans'].values())}")
    print("\nrow-at-a-time python eval (should be none):")
    for r in rows:
        if r["py_eval"]:
            print(f"  {r['query']:36s} py_eval={r['py_eval']}")


if __name__ == "__main__":
    main()
