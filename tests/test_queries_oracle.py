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


def _driver_evidence_round():
    """Latest round each key went green in a driver CORRECTNESS file
    (hash-green, or rows-green for declared no-oracle keys)."""
    import glob
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(str(repo / "CORRECTNESS_r0*.json"))):
        rnd = int(re.search(r"r0*(\d+)", f).group(1))
        for k, v in json.load(open(f)).items():
            ok = v.get("hash_match") or (
                v.get("rows_match") and v.get("err") == "no_oracle")
            if ok:
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def test_registry_prefix_is_oracle_dense():
    """The driver's correctness gate covers a ~50-entry prefix of the
    registry. The r8 head leads with this round's contract changes —
    the three BPE keys promoted from rows-only to hash-gated (the
    unrolled-replace training oracle) and the two lock-fenced
    filestore commit paths — then rotates the STALEST driver evidence
    forward, verified against the CORRECTNESS_r0*.json artifacts
    themselves: everything whose last driver green is r01, then the
    oldest r02 block. Every prefix slot is oracle-backed, and the 4
    remaining rows-only keys sit at the very end of the registry so
    they never occupy a hash-gate slot."""
    ks = list(QUERIES)
    assert ks[:9] == [
        "bpe_train_merges", "bpe_vocab_stats", "bpe_token_count",
        "bpe_compression_curve", "label_centroid_margin",
        "embedding_cov_topk", "stream_sessionize",
        "filestore_keyed_merge", "filestore_concurrent_commit",
    ], ks[:9]
    assert all(k in ORACLES for k in ks[:50]), [
        k for k in ks[:50] if k not in ORACLES]
    latest = _driver_evidence_round()
    # slots 6..50 hold only stale (<= r02) evidence
    stale_head = ks[9:50]
    assert all(latest.get(k, 0) <= 2 for k in stale_head), [
        (k, latest.get(k)) for k in stale_head if latest.get(k, 0) > 2]
    # ALL 16 r01-evidence keys made the head (the verdict's "done"
    # criterion for the rotation)
    r01 = {k for k in ks if latest.get(k) == 1}
    assert r01 <= set(ks[:50]), r01 - set(ks[:50])
    # positions 51+ start with the remaining r02 keys so the r9
    # budget reaches them next
    overflow_r02 = [k for k in ks[50:] if latest.get(k, 99) == 2]
    assert ks[50:50 + len(overflow_r02)] == overflow_r02
    # rows-only keys are dead last
    rows_only = [k for k in ks if k not in ORACLES]
    assert ks[-len(rows_only):] == rows_only and len(rows_only) == 4, (
        rows_only)


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
