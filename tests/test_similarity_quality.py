"""Quality (not equality) checks for the approximate paths: the ANN
sketch indexes must beat random-chance recall against the exact brute
baseline, and the retention matrix must satisfy its cohort invariants.

The oracle gate already proves each query matches its own DuckDB twin
bit-for-bit; these tests prove the *approximation quality* — the part
a hash-match can't see (the LSH oracle runs the same sketch, so a
useless sketch would still hash-match)."""

from distributed_system_mapreduce_spark.operators.similarity import (
    PANEL_SIZE,
    QUERY_MOD,
    TOP_K,
)
from distributed_system_mapreduce_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall_vs_brute(spark, name):
    truth = _topk_sets(
        QUERIES["ann_topk_brute"](spark, SF_DIR).collect())
    approx = _topk_sets(
        QUERIES[name](spark, SF_DIR)
        .filter(f"query_id < {QUERY_MOD * PANEL_SIZE}")
        .collect())
    # candidate-starved queries (tiny bucket) return < K rows; recall
    # is measured over the brute panel either way
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    return hits / (len(truth) * TOP_K)


def test_lsh_recall_beats_chance(spark):
    """Banded sign-LSH must retrieve a large multiple of the chance
    recall (per-band bucket fraction ~ 1/2^ppb ~ 6%; the pre-banding
    single-bucket formulation measured 0.0 here; 4 bands 0.34, 6
    bands 0.52)."""
    r = _recall_vs_brute(spark, "ann_topk_lsh")
    assert r >= 0.40, r


def test_ivf_recall_beats_chance(spark):
    """nprobe=4 IVF (16 cells => ~25% probed chance) must beat chance
    by a wide margin (nprobe=1 measured 0.2, nprobe=2 0.28, nprobe=4
    0.52 here — recall/cost knob documented in ann_topk_ivf)."""
    r = _recall_vs_brute(spark, "ann_topk_ivf")
    assert r >= 0.40, r


def test_pq_recall_beats_chance(spark):
    """8-byte PQ codes (64x compression) on UNclustered random data
    are a coarse quantizer — but must still beat the ~2% chance
    recall by a wide margin (measured 0.16 at this SF)."""
    r = _recall_vs_brute(spark, "ann_topk_pq")
    assert r >= 0.10, r


def test_retention_cohort_invariants(spark):
    """Offset-0 counts the whole cohort; later offsets are subsets;
    cohort sizes sum to the distinct-user total."""
    rows = QUERIES["events_retention"](spark, SF_DIR).collect()
    size0 = {
        r["cohort_week"]: r["n_users"] for r in rows
        if r["week_offset"] == 0
    }
    assert size0, "no cohorts"
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["n_users"] <= size0[r["cohort_week"]], r
    from distributed_system_mapreduce_spark.tables import load_table

    n_users = (
        load_table(spark, "events", SF_DIR)
        .select("user_id").distinct().count()
    )
    assert sum(size0.values()) == n_users
