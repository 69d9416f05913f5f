"""Every registered query vs its DuckDB oracle at sf0.001 — the same
row-count/schema/value comparison the driver gate runs at sf0.01."""

import pytest

from distributed_system_mapreduce_spark.registry import ORACLES, QUERIES
from tests.conftest import SF_DIR, normalize

WITH_ORACLE = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = oracle.sql(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert normalize(sdf.columns, srows) == normalize(dcols, drows)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert sdf.columns


def test_approx_distinct_within_error_bound(spark):
    """HLL++ at rsd=0.01 should be within a few percent of the exact
    distinct counts (exact twin: distinct_users_by_type). The gated
    query now emits exact_users + a within_bound verdict (the oracle
    asserts it TRUE); this test recomputes the raw estimate
    INDEPENDENTLY so the bound is checked on the sketch value itself,
    not just the query's own verdict."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.tables import load_table

    gated = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct_users_by_type"](
            spark, SF_DIR).collect()
    }
    approx = {
        r["event_type"]: r["a"]
        for r in load_table(spark, "events", SF_DIR)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in QUERIES["distinct_users_by_type"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact) == set(gated)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), (k, approx[k], n)
        assert gated[k]["exact_users"] == n, k
        assert gated[k]["within_bound"] is True, k


def test_registry_prefix_is_oracle_dense():
    """The driver's correctness gate covers a ~50-entry prefix of the
    registry. r6 is the FINAL rotation: the prefix holds every key no
    earlier gate has run — oracle-backed slots FIRST (the strong
    check), the 7 rows-only keys last (their weaker rows-only run is
    still their first driver signal), and no slot wasted on an
    already-driver-confirmed query."""
    ks = list(QUERIES)
    # oracle-backed prefix block, rows-only block strictly after it
    first_rows_only = next(
        i for i, k in enumerate(ks[:50]) if k not in ORACLES)
    assert all(k in ORACLES for k in ks[:first_rows_only])
    assert all(k not in ORACLES for k in ks[first_rows_only:50]), [
        k for k in ks[first_rows_only:50] if k in ORACLES]
    assert first_rows_only >= 43, first_rows_only
    # no slot wasted on an already-driver-confirmed query (spot-check
    # against the r1/r2 confirmations; the changed-contract entries
    # filestore_concurrent_commit / ann_recall_eval /
    # approx_distinct_users_by_type are deliberate re-gates)
    confirmed_r1_r2 = {
        "mr_wordcount_exe", "events_asof_order", "purchase_attribution",
        "dedup_exact", "dedup_minhash", "q1_pricing_summary",
        "q8_market_share", "q9_product_profit", "kmv_distinct",
        "wordcount", "vote_winner", "mr_wordcount", "q2_best_supplier",
        "corpus_stats", "vote_round1", "events_sessionize",
    }
    overlap = confirmed_r1_r2 & set(ks[:50])
    assert not overlap, overlap


def test_load_table_repins_utc_session_tz(spark):
    """The driver may run queries in a non-UTC session; load_table
    must re-pin UTC on every call (NTZ casts and to_date boundaries
    depend on it)."""
    from distributed_system_mapreduce_spark.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        load_table(spark, "events", SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_read_events_stream_repins_utc_session_tz(spark):
    """Streaming queries that never touch load_table (windowed
    rollup, dedup census, funnel join) get the same defensive pin
    from read_events_stream — their NTZ->timestamp cast and window
    boundaries would otherwise shift in a non-UTC driver session."""
    from distributed_system_mapreduce_spark.streaming import (
        read_events_stream,
    )

    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        read_events_stream(spark, SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
