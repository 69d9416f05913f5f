"""Misra-Gries frequent-items sketch: error-bound and containment
guarantees against the exact token counts (the sketch is rows-only by
design — its estimates depend on partitioning — so the oracle here is
the mathematical guarantee, not value equality)."""

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.text import TOKENS_EXPR
from distributed_system_mapreduce_spark.operators.sketches import (
    MG_K,
    MG_TOPN,
)
from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.tables import load_table
from tests.conftest import SF_DIR


def test_freq_items_sketch_bounds_and_containment(spark):
    rows = QUERIES["freq_items_sketch"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= MG_TOPN
    d = rows[0]["max_undercount"]
    assert all(r["max_undercount"] == d for r in rows)

    exact = {
        r["tok"]: r["n"]
        for r in load_table(spark, "documents", SF_DIR)
        .select(F.explode(F.expr(TOKENS_EXPR)).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())
    # global MG guarantee on the summed decrements
    assert 0 <= d <= n_total // (MG_K + 1)
    # per-item sandwich: est <= true <= est + D
    for r in rows:
        true = exact[r["tok"]]
        assert r["est_count"] <= true <= r["est_count"] + d, (r, true)
    # containment: any token whose true count clears the worst
    # reported estimate by more than D must be in the report
    # (otherwise it would out-rank the tail even fully undercounted)
    reported = {r["tok"] for r in rows}
    if len(rows) == MG_TOPN:
        floor = min(r["est_count"] for r in rows) + d
        for tok, true in exact.items():
            if true > floor:
                assert tok in reported, (tok, true, floor)


def test_hll_sketch_store_merge(spark, tmp_path):
    """Persisted mergeable sketches — the warehouse pattern: per-day
    HLL sketches written once as binary columns in the FileStore,
    later UNIONED at read time to answer any-date-range distinct
    questions without rescanning the raw events. The merged estimate
    must equal the single-pass whole-corpus sketch exactly (same
    algorithm, same lgConfigK), and sit within HLL error of truth."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.sources.filestore import (
        FileStore,
    )
    from distributed_system_mapreduce_spark.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"))
    fs = FileStore(spark, str(tmp_path / "store"))
    fs.write(daily, "daily_user_sketches")

    merged = (
        fs.read("daily_user_sketches")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .alias("est")).collect()[0]["est"]
    true = ev.select("user_id").distinct().count()
    assert merged == direct  # merge-of-parts == single pass, exactly
    assert abs(merged - true) <= max(2, 0.05 * true)


def test_kmv_set_ops_within_error_bound(spark):
    """The KMV pair estimates must land near the exact
    audience_overlap values: with K=64 the union RSE is ~13%, so a
    35% relative envelope (3 sigma-ish) on union and intersection,
    and an absolute 0.25 envelope on Jaccard, catches a broken
    estimator without flaking on sketch variance."""
    from distributed_system_mapreduce_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    est = {(r["type_a"], r["type_b"]): r
           for r in QUERIES["kmv_set_ops"](spark, SF_DIR).collect()}
    exact = {(r["type_a"], r["type_b"]): r
             for r in QUERIES["audience_overlap"](spark, SF_DIR).collect()}
    # every exact pair with shared users must appear in the sketch view
    assert set(exact) <= set(est)
    for key, ex in exact.items():
        e = est[key]
        union = ex["n_a"] + ex["n_b"] - ex["n_both"]
        assert abs(e["est_union"] - union) <= max(5, 0.35 * union), (
            key, e["est_union"], union)
        assert abs(e["est_jaccard"] - ex["jaccard"]) <= 0.25, (
            key, e["est_jaccard"], ex["jaccard"])
        assert abs(e["est_intersection"] - ex["n_both"]) <= max(
            5, 0.35 * max(ex["n_both"], 1)), (
            key, e["est_intersection"], ex["n_both"])
