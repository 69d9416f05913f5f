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
