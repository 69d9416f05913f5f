"""ANN above the auto-scale knee (r9 verdict item 3): every prior
recall/cost measurement sat BELOW the 64k-vector knee where
lsh_params()/ivf_cells() return their floor configs — so the
auto-scaled index regime was extrapolated, never measured. This
panel builds a 128k-vector corpus (build_embed_corpus(64): offset-
shifted vec_ids, per-copy dimension ROTATION so copies are genuinely
distinct vectors, not planted duplicates), verifies the growth rules
actually engage (ivf_cells 16 -> 32, lsh 12x4 -> 16x5), measures
recall@k of all four approximate paths against brute on the fixed
64-query panel, times every path, and writes an `ann_knee` panel
into SCALING.json.

Floors asserted here: LSH/IVF >= 0.60 (same as below the knee), and
for the PQ paths PQ >= 0.15 / IVF-PQ >= 0.10 (coarser than the 0.30
production floors tests/test_similarity_quality.py enforces at the
test SFs — compression noise genuinely grows with n; measured
0.24/0.22 at 128k under the scaled knobs). History
of the PQ-path knee measurements (each config measured here):
est-only ordering with the fixed 16-codeword floor codebook
collapsed to 0.03/0.02 at 128k; adding fixed-depth ADC+R refine
recovered 0.117/0.106; r10 then made BOTH knobs auto-scale past the
knee like ivf_cells — pq_k(n) ~ PQ_K*sqrt(n/knee) (codebook
resolution must multiply with the corpus) and pq_refine(n) ~ linear
in n/knee (rank dispersion at fixed code width grows with n) — see
the `recalls` block for the currently measured values.

Usage: python tools/ann_knee.py [out_json] [k_mult]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_curve import build_embed_corpus  # noqa: E402

FLOORS = {"lsh": 0.60, "ivf": 0.60, "pq": 0.15, "ivfpq": 0.10}
PATHS = ["ann_topk_brute", "ann_topk_lsh", "ann_topk_ivf",
         "ann_topk_pq", "ann_topk_ivfpq"]
REPEATS = 3


def main() -> None:
    argv = sys.argv[1:]
    out_path = argv[0] if argv else os.path.join(REPO, "SCALING.json")
    k = int(argv[1]) if len(argv) > 1 else 64

    import distributed_system_mapreduce_spark.operators.similarity as S
    from distributed_system_mapreduce_spark.registry import QUERIES
    from distributed_system_mapreduce_spark.session import get_spark

    d = build_embed_corpus(k)
    spark = get_spark("ann-knee")
    # JIT warmup outside the timed region
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop") \
        .mode("overwrite").save()

    n = S._corpus_count(spark, d)
    bands, ppb = S.lsh_params(n)
    cells = S.ivf_cells(n)
    pqk, pqr = S.pq_k(n), S.pq_refine(n)
    knee_engaged = (bands, ppb) != (S.N_BANDS, S.PLANES_PER_BAND) \
        and cells != S.N_CELLS and pqk != S.PQ_K
    print(f"n={n} lsh={bands}x{ppb} (floor {S.N_BANDS}x"
          f"{S.PLANES_PER_BAND}) ivf_cells={cells} (floor {S.N_CELLS}) "
          f"pq_k={pqk} pq_refine={pqr} (floors {S.PQ_K}/{S.PQ_REFINE}) "
          f"knee_engaged={knee_engaged}", flush=True)
    if not knee_engaged:
        raise SystemExit("corpus did not cross the auto-scale knee — "
                         "panel would re-measure the floor regime")

    def drop_persisted() -> None:
        spark.catalog.clearCache()
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = m.iterator()
        while it.hasNext():
            it.next()._2().unpersist(True)

    times: dict[str, dict] = {}
    for name in PATHS:
        reps = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            QUERIES[name](spark, d).write.format("noop") \
                .mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
            drop_persisted()
        times[name] = {"reps": reps,
                       "median": round(statistics.median(reps), 3)}
        print(f"{name}: {reps} median={times[name]['median']}",
              flush=True)

    rows = QUERIES["ann_recall_eval"](spark, d).collect()
    recalls = {r["method"]: {
        "recall": round(r["recall"], 4),
        "n_queries": r["n_queries"],
        "min_hits": r["min_hits"],
        "floor": FLOORS[r["method"]],
        "floor_ok": r["recall"] >= FLOORS[r["method"]],
    } for r in rows}
    for m, rec in sorted(recalls.items()):
        print(f"recall {m}: {rec['recall']} (floor {rec['floor']} "
              f"ok={rec['floor_ok']})", flush=True)

    brute_med = times["ann_topk_brute"]["median"]
    panel = {
        "n_vectors": n,
        "k_mult": k,
        "lsh_params": [bands, ppb],
        "ivf_cells": cells,
        "pq_k": pqk,
        "pq_refine": pqr,
        "floor_params": {"lsh": [S.N_BANDS, S.PLANES_PER_BAND],
                         "ivf": S.N_CELLS,
                         "pq": [S.PQ_K, S.PQ_REFINE]},
        "knee_engaged": knee_engaged,
        "times_sec": times,
        "cost_vs_brute": {
            p.replace("ann_topk_", ""): round(
                times[p]["median"] / max(brute_med, 0.001), 3)
            for p in PATHS},
        "recalls": recalls,
        "all_floors_ok": all(r["floor_ok"] for r in recalls.values()),
        "note": (
            "128k-vector corpus (64 x sf0.1, per-copy dim rotation — "
            "no planted duplicates), measured ABOVE the 64k "
            "auto-scale knee with every growth rule engaged "
            "(lsh_params, ivf_cells, and — r10 — pq_k/pq_refine: the "
            "PQ codebook doubles and the ADC+R refine depth doubles "
            "at this n; the fixed-floor configs measured 0.03/0.02 "
            "est-only and 0.117/0.106 with fixed-depth refine). "
            "Brute is the 64-query x corpus nested loop; approximate "
            "costs include index build from cold (the amortizable "
            "part at 100 TB)."),
    }
    with open(out_path) as fh:
        doc = json.load(fh)
    doc["ann_knee"] = panel
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print("updated", out_path)
    if not panel["all_floors_ok"]:
        raise SystemExit("recall floor violated above the knee")


if __name__ == "__main__":
    main()
