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


# the round whose artifacts the CURRENT head was constructed from.
# Evidence from later rounds (produced by the very gate the head
# feeds) must NOT flip this test: the r8 head turned red the moment
# CORRECTNESS_r08.json landed because it derived staleness from ALL
# artifacts, including the one its own rotation had just refreshed.
HEAD_BUILT_FROM_ROUND = 9


def _driver_evidence_round(artifact_dir=None, cap: int = 99):
    """Latest round <= cap each key went green in a driver
    CORRECTNESS file (hash-green, or rows-green for declared
    no-oracle keys)."""
    import glob
    import json
    import re
    from pathlib import Path

    repo = Path(artifact_dir) if artifact_dir else (
        Path(__file__).resolve().parent.parent)
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        # parse from the basename: a repo checkout under a path that
        # itself contains r<digits> (e.g. /tmp/r11_green) must not
        # shadow the artifact's round number
        rnd = int(re.search(r"r0*(\d+)", Path(f).name).group(1))
        if rnd > cap:
            continue
        for k, v in json.load(open(f)).items():
            ok = v.get("hash_match") or (
                v.get("rows_match") and v.get("err") == "no_oracle")
            if ok:
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def test_registry_prefix_is_oracle_dense():
    """The driver's correctness gate covers a ~50-entry prefix of the
    registry. The r10 head leads with the contracts whose
    IMPLEMENTATION changed this round (kmeans_certify's single-train
    cost, filestore_lsh_probe's pid-unique store, the three ADC+R
    ANN keys, the two stream-stream joins' drain partitioning) plus
    the three brand-new membership-protocol keys (first driver
    evidence), then ALL remaining keys whose last driver green was
    r03 — the stalest bucket after r9 closed the r02 block — then
    the oldest r04 keys to fill the budget. Staleness is derived
    from the artifacts AS OF the round the head was built
    (HEAD_BUILT_FROM_ROUND) so the gate's own future output cannot
    invalidate the assertion."""
    ks = list(QUERIES)
    lead = ["kmeans_certify", "filestore_lsh_probe", "ann_topk_pq",
            "ann_topk_ivfpq", "ann_recall_eval", "stream_funnel_join",
            "stream_abandoned_views", "gossip_dissemination",
            "failure_detection_census", "membership_lww_merge",
            "replica_rebalance_census"]
    assert ks[:len(lead)] == lead
    assert all(k in ORACLES for k in ks[:50]), [
        k for k in ks[:50] if k not in ORACLES]
    latest = _driver_evidence_round(cap=HEAD_BUILT_FROM_ROUND)
    # ALL r03-evidence keys occupy the slots right after the lead
    # (25 total as of r9; three — ann_topk_pq, events_path_trigrams,
    # events_skew_rollup — already sit in the lead)
    r03 = {k for k in ks if latest.get(k) == 3}
    r03_rest = r03 - set(lead)
    n = len(lead)
    assert set(ks[n:n + len(r03_rest)]) == r03_rest, (
        sorted(r03_rest ^ set(ks[n:n + len(r03_rest)])))
    assert len(r03) == 25, sorted(r03)
    # the rest of the head and the overflow continue oldest-first:
    # nothing outside the head may be staler than anything inside it
    # (excluding the contract/new lead slots)
    head_max = max(latest.get(k, 0) for k in ks[n:50])
    rest_min = min(latest.get(k, 99) for k in ks[50:]
                   if k in ORACLES)
    assert head_max <= rest_min, (head_max, rest_min)
    # rows-only keys are dead last
    rows_only = [k for k in ks if k not in ORACLES]
    assert ks[-len(rows_only):] == rows_only and len(rows_only) == 4, (
        rows_only)


def test_evidence_cap_survives_future_artifacts(tmp_path):
    """Regression for the r8 self-invalidation: a synthetic FUTURE
    artifact (r99, refreshing every key) must not change the capped
    staleness computation the head test relies on."""
    import json
    import shutil
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        shutil.copy(f, tmp_path / f.name)
    before = _driver_evidence_round(tmp_path, cap=HEAD_BUILT_FROM_ROUND)
    fresh = {k: {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None} for k in QUERIES}
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(fresh))
    after = _driver_evidence_round(tmp_path, cap=HEAD_BUILT_FROM_ROUND)
    assert before == after
    # and the uncapped view DOES see the new round (the helper itself
    # is not blind to fresh evidence — only the head test pins a cap)
    assert set(_driver_evidence_round(tmp_path).values()) >= {99}


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
