"""Protocol invariants for the membership/failure-detection family
(operators/membership.py) — the properties a hash-match against an
identically-written oracle can't certify on its own."""

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.operators.membership import (
    GOSSIP_FANOUT,
    GOSSIP_ROUNDS,
    LWW_SUBJECTS,
    STALENESS_S,
)
from distributed_system_mapreduce_spark.registry import QUERIES
from distributed_system_mapreduce_spark.tables import load_table
from tests.conftest import SF_DIR


def test_gossip_converges_and_accounts(spark):
    """Push gossip at fanout 5 must actually inform the whole
    cluster within the simulated horizon (the reference's protocol
    works; a broken target hash that, say, always hit the same node
    would still hash-match its oracle twin). Also pins the message
    accounting: gossip sends FANOUT x previously-informed per round,
    all-to-all always pays N x (N-1)."""
    rows = {r["round"]: r for r in
            QUERIES["gossip_dissemination"](spark, SF_DIR).collect()}
    n_nodes = load_table(spark, "customer", SF_DIR).count()
    assert set(rows) == set(range(GOSSIP_ROUNDS + 1))
    assert rows[0]["n_informed"] == 1 and rows[0]["msgs_gossip"] == 0
    for r in range(1, GOSSIP_ROUNDS + 1):
        prev = rows[r - 1]
        assert rows[r]["n_informed"] >= prev["n_informed"], r
        assert rows[r]["n_informed"] <= n_nodes, r
        assert (rows[r]["n_new"]
                == rows[r]["n_informed"] - prev["n_informed"]), r
        assert (rows[r]["msgs_gossip"]
                == GOSSIP_FANOUT * prev["n_informed"]), r
        assert rows[r]["msgs_alltoall"] == n_nodes * (n_nodes - 1), r
    assert rows[GOSSIP_ROUNDS]["n_informed"] == n_nodes, (
        "gossip failed to converge within the horizon")


def test_gossip_node_space_is_contiguous(spark):
    """The target arithmetic (h % N) assumes the customer key space
    is exactly 0..N-1 — pin the assumption the docstring states."""
    row = load_table(spark, "customer", SF_DIR).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("lo"),
        F.max("c_custkey").alias("hi")).first()
    assert row["lo"] == 0 and row["hi"] == row["n"] - 1


def test_failure_census_gap_consistency(spark):
    """A node's false-detection count is positive iff its worst
    silence exceeds the staleness threshold, and every node's declare
    time is exactly last heartbeat + threshold."""
    rows = QUERIES["failure_detection_census"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # declare time = last heartbeat + threshold, to the second
        delta = (r["detect_ts"] - r["last_ts"]).total_seconds()
        assert delta == STALENESS_S, r
        if r["max_gap_s"] is not None and r["max_gap_s"] > STALENESS_S:
            assert r["n_false_detections"] >= 1, r
        if r["n_false_detections"] > 0:
            assert r["max_gap_s"] >= STALENESS_S, r


def test_lww_winner_is_latest(spark):
    """Every slot's winning observation carries that slot's maximum
    observation time (the MergeTables newer-LastTime-wins rule)."""
    res = QUERIES["membership_lww_merge"](spark, SF_DIR)
    ev = load_table(spark, "events", SF_DIR).select(
        (F.col("event_id") % LWW_SUBJECTS).alias("subject"),
        F.col("ts").cast("timestamp").alias("ts"))
    latest = ev.groupBy("subject").agg(F.max("ts").alias("max_ts"))
    bad = (res.join(latest, "subject")
           .filter(F.col("last_time") != F.col("max_ts")))
    assert bad.count() == 0
    assert res.count() <= LWW_SUBJECTS


def test_rebalance_minimal_disruption(spark):
    """The consistent-hash departure census must exhibit exactly the
    property RellocateFiles implements imperatively: every file that
    held the departed node gains exactly ONE new holder, no other
    file moves, and no surviving node loses a replica."""
    from distributed_system_mapreduce_spark.operators.membership import (
        REPLICAS,
    )

    rows = {r["node"]: r for r in
            QUERIES["replica_rebalance_census"](spark, SF_DIR).collect()}
    n_files = load_table(spark, "documents", SF_DIR).count()
    leaver = min(rows)
    lv = rows[leaver]
    assert lv["files_after"] == 0 and lv["n_gained"] == 0
    total_gained = sum(r["n_gained"] for r in rows.values())
    assert total_gained == lv["files_before"], (
        total_gained, lv["files_before"])
    for node, r in rows.items():
        if node == leaver:
            continue
        # survivors never lose: after = before + gained
        assert r["files_after"] == r["files_before"] + r["n_gained"], r
    # every file holds exactly REPLICAS replicas in both placements
    assert sum(r["files_before"] for r in rows.values()) \
        == REPLICAS * n_files
    assert sum(r["files_after"] for r in rows.values()) \
        == REPLICAS * n_files
