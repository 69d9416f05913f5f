"""Benchmark harness: runs every registered query at the bench SF and
prints ONE JSON line (driver contract).

Materialization is via the noop sink (full execution, no driver
collect). Time includes plan + execution per query on a warm session.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "wordcount", "mr_wordcount",
    "dedup_minhash", "dedup_ngram_jaccard", "ann_topk_brute",
    "events_daily_rollup", "events_sessionize", "top_customers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:] or None

    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers with a cheap scan
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    # warm the Python/Arrow worker pool so the first mapInPandas query
    # doesn't get billed the daemon startup cost
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format(
        "noop").mode("overwrite").save()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    names = only or list(QUERIES)
    # min of 2 runs: absorbs one-time codegen JIT (negligible at real
    # scale) and host-CPU contention noise on the shared test box
    def _drop_persisted() -> None:
        # several queries localCheckpoint() intermediates; across 120+
        # queries in ONE JVM those persisted RDDs accumulate and the
        # memory pressure inflates later queries (measured: a 1.7s
        # engine query read 5s late in a full run). Real deployments
        # run one job per session — drop the leftovers between queries.
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        while it.hasNext():
            # blocking: with async unpersist the blocks linger while
            # the next query runs, and across 140+ queries the
            # executor-memory pressure inflates the tail of the run
            it.next()._2().unpersist(True)

    errors: dict[str, str] = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                _drop_persisted()
        except Exception as exc:  # one broken query must not void
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            _drop_persisted()     # the whole round's bench artifact
            continue
        times[name] = round(best, 3)

    headline_errors = [n for n in HEADLINE if n in errors]
    # a missing HEADLINE member must not make the headline look
    # FASTER: the metric is only valid when every member ran
    total = (round(sum(times[n] for n in HEADLINE if n in times), 3)
             if not headline_errors else None)
    # Full per-query map goes to a file; the final stdout line stays
    # short (headline queries only) so the driver's line capture never
    # truncates mid-JSON (r1's ~2 KB line came back unparsed).
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump({"sf": float(sf), "queries": times, "errors": errors},
                  fh, indent=1, sort_keys=True)
    line = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": {n: times[n] for n in HEADLINE if n in times},
        "sf": float(sf),
        "n_queries": len(times),
        # round-over-round comparable: r1's recorded value was the
        # all-queries total (53.2s over 74 queries at sf0.1)
        "total_all_queries": round(sum(times.values()), 3),
        "detail": "BENCH_DETAIL.json",
    }
    if errors:
        line["n_errors"] = len(errors)
    if headline_errors:
        line["headline_invalid"] = headline_errors
    print(json.dumps(line))


if __name__ == "__main__":
    main()
