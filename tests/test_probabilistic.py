"""kmv_distinct / bloom_semi_filter: the guarantees that the oracle
gate (value equality) cannot express — estimator accuracy against the
exact distinct count, and the Bloom no-false-negative invariant
against the exact semi join."""

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.operators.probabilistic import (
    KMV_K,
)
from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.tables import load_table
from tests.conftest import SF_DIR


def test_kmv_estimate_within_error_bound(spark):
    rows = QUERIES["kmv_distinct"](spark, SF_DIR).collect()
    assert len(rows) == 20  # one per source

    from distributed_system_mapreduce_spark.functions import text as X

    docs = load_table(spark, "documents", SF_DIR)
    toks = docs.select("source", F.expr(X.TOKENS_EXPR).alias("toks"))
    exact = {
        r["source"]: r["d"]
        for r in toks.select(
            "source",
            F.explode(F.array_distinct(
                F.expr(X.shingles_from("toks")))).alias("s"),
        ).groupBy("source")
        .agg(F.countDistinct("s").alias("d")).collect()
    }
    for r in rows:
        true = exact[r["source"]]
        if r["n_kept"] < KMV_K:
            assert r["est_distinct"] == r["n_kept"] == true
        else:
            # RSE ~ 1/sqrt(K-2) ~ 12.7% at K=64; allow 4 sigma
            assert 0.5 * true <= r["est_distinct"] <= 1.6 * true, (
                r, true)


def test_bloom_no_false_negatives_and_accounting(spark):
    row = QUERIES["bloom_semi_filter"](spark, SF_DIR).collect()[0]

    cust = load_table(spark, "customer", SF_DIR)
    orders = load_table(spark, "orders", SF_DIR)
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")).distinct()
    semi = orders.join(
        keys, orders["o_custkey"] == keys["k"], "left_semi").count()

    # Bloom never drops a true match: every semi-join row passes
    assert row["true_match"] == semi
    assert row["bloom_pass"] == row["true_match"] + row["false_pos"]
    assert row["n_orders"] == orders.count()
    assert row["false_pos"] >= 0
    # 16384 bits over ~34 keys at sf0.001: fp rate must be tiny
    assert row["fp_rate"] < 0.05
