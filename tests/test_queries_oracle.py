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
    registry. The r6 rotation finished first-time coverage, so the r7
    prefix leads with the keys that still need a FIRST or FRESH driver
    signal — the three new r7 queries, the six r6 additions (only
    locally gated so far), and the contract-/implementation-changed
    entries — then spends the rest of the budget re-confirming,
    oldest driver evidence first. Every prefix slot is oracle-backed:
    all 7 rows-only keys already have their driver signal, so none may
    waste a strong-check slot."""
    ks = list(QUERIES)
    head_new_or_changed = [
        # never driver-gated: the six r6 additions + three r7 additions
        "approx_quantiles_certify", "freq_items_certify",
        "ann_topk_ivfpq", "filestore_snapshot_diff",
        "stream_snapshot_append", "filestore_schema_evolution",
        "kmeans_certify", "compression_ratio_certify",
        "multimodal_video_mjpg",
        # changed this round: ivfpq row added to the recall eval; the
        # CAS/lock rework sits under both filestore commit paths; the
        # closed-form TVD rewrite changed t_closeness's oracle
        "ann_recall_eval", "filestore_concurrent_commit",
        "filestore_keyed_merge", "t_closeness",
        # new r7 key: the BPE oracle-promotion twin
        "bpe_certify",
        # r7 scan-reduction rewrites — oracles unchanged,
        # implementations changed, so re-gate
        "user_survival_km", "fk_integrity", "join_key_skew",
        "bigram_lift", "skipgram_lift", "shard_assignment",
        "dsir_importance", "lang_source_pmi", "rare_token_rate",
        "customer_decile_migration", "nation_share_yoy", "customer_rfm",
        "returns_mix_shift", "events_chi2_dow", "events_drift",
        "user_traj_topk", "weighted_median_price", "audience_overlap",
        "quality_dup_correlation", "ngram_novelty",
        "quality_adaptive_filter", "split_ks_check", "token_rank_curve",
        "tfidf_topterms",
        "assoc_rules", "join_size_estimate", "lifecycle_conformance",
        "mix_rebalance_sample",
    ]
    assert ks[:42] == head_new_or_changed, ks[:42]
    assert all(k in ORACLES for k in ks[:50]), [
        k for k in ks[:50] if k not in ORACLES]
    # the refresh block re-gates OLDEST evidence first: every slot
    # after the head must be a key first gated in r1/r2 (per the
    # VERDICT r6 evidence table), not a recently-confirmed one
    refreshed = set(ks[42:50])
    recently_gated_r5_r6 = {
        "order_total_audit", "weighted_median_price", "bot_rule_census",
        "dedup_agreement", "seasonal_strength", "multimodal_decode",
        "semdedup_prune", "benford_audit", "hits_scores",
        "ann_maxsim", "late_arrival_census", "entity_canonicalize",
    }
    assert not (refreshed & recently_gated_r5_r6), (
        refreshed & recently_gated_r5_r6)


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
