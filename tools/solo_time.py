"""Solo warm timings for named queries (bench methodology: noop sink,
min of N on a warm session, persisted RDDs dropped between runs).

Usage: python tools/solo_time.py [-n reps] <query> [query ...]
SPARK_GRAFT_SF_DIR selects the corpus (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    argv = sys.argv[1:]
    reps = 2
    if argv and argv[0] == "-n":
        reps = int(argv[1])
        argv = argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    spark = get_spark("solo_time")
    # the bench group warmup, abridged: plan families + Python workers
    for w in ("q6_forecast_revenue", "q3_shipping_priority",
              "events_running_total"):
        QUERIES[w](spark, sf_dir).write.format(
            "noop").mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format(
        "noop").mode("overwrite").save()
    if any(getattr(QUERIES[n], "__module__", "").endswith(".similarity")
           for n in argv):
        from distributed_system_mapreduce_spark.operators.similarity import (
            warm_corpus_count,
        )

        warm_corpus_count(spark, sf_dir)

    def _drop_persisted() -> None:
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    from bench import host_speed_canary

    out: dict[str, dict] = {"_canary_start": host_speed_canary()}
    for name in argv:
        fn = QUERIES[name]
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            _drop_persisted()
        out[name] = {"min": min(runs), "runs": runs}
    out["_canary_end"] = host_speed_canary()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
