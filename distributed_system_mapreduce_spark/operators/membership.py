"""Membership / failure-detection protocol analogues (reference:
detect_failures/detect_failures.go, net_node/node.go).

The reference's failure-detection layer was until round 10 the one
piece of its surface with NO executable analogue here (SURVEY §4
delegates live membership to the cluster manager — the right call at
100 TB, where you do not hand-roll gossip under Spark). These
operators close the gap the way an analytics engine should: as
DETERMINISTIC, oracle-gated computations of the protocol's
behaviors, runnable on the cluster-event tables any 1000-executor
deployment already has —

- ``gossip_dissemination``: the round-by-round spread of a
  membership update under the reference's push-gossip (each node
  pings 5 targets per round — ping_nodes_gossip,
  detect_failures.go:40-66) vs the all-to-all alternative
  (ping_nodes_all_to_all, :82-90), as a per-round informed-count /
  message-cost table. The reference picks targets with
  rand.Shuffle; here targets are md5-deterministic so the DuckDB
  oracle replicates the propagation bit-for-bit.
- ``failure_detection_census``: the staleness rule (an ACTIVE entry
  whose last heartbeat is older than 3.5x the ping period is marked
  FAILED — DetectFailures, detect_failures.go:181-196) applied to a
  real heartbeat log, including the false-positive census the
  reference's own comments worry about (detect_failures.go:70-71).
- ``membership_lww_merge``: the last-writer-wins table merge (an
  incoming entry replaces the local one iff its LastTime is newer —
  MergeTables, detect_failures.go:103-133) over a corpus of
  per-observer status observations.
- ``replica_rebalance_census``: the replica-placement fallout of one
  node's departure (RellocateFiles, file_system.go:725) under
  4-replica consistent-hash-ring placement.

Scale shape: gossip_dissemination is R_MAX bounded rounds of
explode + distinct over the roster (per-round lineage cut, never a
cross join); the census is one partitioned lag-window over the
heartbeat log; the merge is a per-subject top-1 window (WindowGroup-
Limit partial top-k below the exchange) plus a partial-agg count;
the rebalance census indexes the ring with per-arc ranks + stitched
arc offsets and joins on ring_index — all hold at any node/log
cardinality.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.lineage import cut, cut_deep
from distributed_system_mapreduce_spark.operators.probabilistic import (
    _hex_conv,
    _hex_long,
)
from distributed_system_mapreduce_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# push-gossip fanout per round (the reference pings 5 ACTIVE targets
# per 1s tick — ping_nodes_gossip's num_pinged < 5 loop) and the
# fixed simulated horizon: 5-fanout push gossip informs a 15k-node
# cluster in ~7 rounds, so 12 bounds convergence with a tail margin
# while keeping the output schema data-independent
GOSSIP_FANOUT = 5
GOSSIP_ROUNDS = 12

# staleness threshold = 3.5 x the nominal heartbeat period, the
# reference's exact ratio (3.5s over a 1s ping loop —
# detect_failures.go:191 against PingNodes' 1s sleep). The events
# table's per-node cadence has a ~27000s median inter-heartbeat gap,
# so the nominal period is 27000s.
HEARTBEAT_PERIOD_S = 27_000
STALENESS_S = int(3.5 * HEARTBEAT_PERIOD_S)  # 94500

# membership table size for the LWW merge (subjects = node slots,
# like the reference's fixed-width Table array)
LWW_SUBJECTS = 64


def _gossip_target_spark(round_expr: str, n: int) -> str:
    """Deterministic gossip target: first 12 md5 hex nibbles of
    'g:<sender>:<round>:<j>' mod cluster size. j=0 carries the
    sender itself (one reference to the roster per round, so the
    oracle's recursive CTE needs only a single self-reference)."""
    h = _hex_conv(
        f"md5(concat('g:', CAST(node AS STRING), ':', "
        f"CAST({round_expr} AS STRING), ':', CAST(j AS STRING)))", 12)
    return (f"CASE WHEN j = 0 THEN node "
            f"ELSE CAST({h} % {n} AS BIGINT) END")


def gossip_dissemination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-by-round dissemination of one membership update (a node
    LEAVING — the event send_gossip_ping floods when leaving=true)
    through the customer-table cluster (nodes = c_custkey, a
    contiguous 0..N-1 id space): round 0 only the origin (min key)
    knows; each round every informed node pushes to GOSSIP_FANOUT
    md5-deterministic targets. Output per round: informed count, new
    informees, and the message cost of gossip (FANOUT x informed)
    vs all-to-all heartbeating (N x (N-1)) — the bandwidth/latency
    trade SwitchMode (detect_failures.go:138-160) exists to toggle.

    Scale: the roster never exceeds N rows; each round is one
    explode(FANOUT+1) + distinct with a per-round lineage cut —
    12 bounded shuffles, no cross join, no global window (the
    13-row summary derives n_new by a round-to-round self-join)."""
    cust = load_table(spark, "customer", sf_dir)
    row = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("origin")).first()
    n, origin = int(row["n"]), int(row["origin"])

    roster = spark.range(1).select(
        F.lit(origin).cast("long").alias("node"))
    rounds = [roster.select(F.lit(0).cast("long").alias("round"),
                            "node")]
    for r in range(1, GOSSIP_ROUNDS + 1):
        roster = (
            roster.select(
                "node",
                F.explode(
                    F.expr(f"sequence(0, {GOSSIP_FANOUT})")).alias("j"))
            .select(F.expr(_gossip_target_spark(str(r), n))
                    .alias("node"))
            .distinct()
            # LAZY per-round barrier (r10): the cut only exists to
            # truncate lineage/plan growth — each round's distinct is
            # a shuffle stage the single final action already computes
            # exactly once (both consumers, round r+1 and the union,
            # reuse its shuffle output), so the 12 EAGER
            # materialization jobs were pure per-round scheduling tax
            .transform(lambda df: cut(df, eager=False, deep=True))
        )
        rounds.append(roster.select(
            F.lit(r).cast("long").alias("round"), "node"))

    per_round = (
        reduce(DataFrame.unionByName, rounds)
        .groupBy("round")
        .agg(F.count(F.lit(1)).cast("long").alias("n_informed"))
    )
    prev = per_round.select(
        (F.col("round") + 1).alias("round"),
        F.col("n_informed").alias("prev_informed"))
    return (
        per_round.join(prev, "round", "left")
        .select(
            "round",
            "n_informed",
            (F.col("n_informed")
             - F.coalesce("prev_informed", F.lit(0)))
            .cast("long").alias("n_new"),
            (F.lit(GOSSIP_FANOUT)
             * F.coalesce("prev_informed", F.lit(0)))
            .cast("long").alias("msgs_gossip"),
            F.when(F.col("round") > 0, F.lit(n * (n - 1)))
            .otherwise(F.lit(0)).cast("long").alias("msgs_alltoall"),
        )
    )


def _gossip_target_sql(n_sql: str) -> str:
    h = _hex_long(
        "md5('g:' || CAST(i.node AS VARCHAR) || ':' || "
        "CAST(i.round + 1 AS VARCHAR) || ':' || "
        "CAST(j.j AS VARCHAR))", 12)
    return (f"CASE WHEN j.j = 0 THEN i.node "
            f"ELSE CAST({h} % ({n_sql}) AS BIGINT) END")


GOSSIP_DISSEMINATION_SQL = f"""
WITH RECURSIVE params AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(c_custkey) AS BIGINT) AS origin
  FROM customer
),
inf(round, node) AS (
  SELECT CAST(0 AS BIGINT), origin FROM params
  UNION ALL
  SELECT DISTINCT i.round + 1,
         {_gossip_target_sql("SELECT n FROM params")}
  FROM inf i CROSS JOIN generate_series(0, {GOSSIP_FANOUT}) AS j(j)
  WHERE i.round < {GOSSIP_ROUNDS}
),
per_round AS (
  SELECT round, CAST(COUNT(*) AS BIGINT) AS n_informed
  FROM inf GROUP BY round
)
SELECT c.round,
       c.n_informed,
       CAST(c.n_informed - COALESCE(p.n_informed, 0) AS BIGINT)
         AS n_new,
       CAST({GOSSIP_FANOUT} * COALESCE(p.n_informed, 0) AS BIGINT)
         AS msgs_gossip,
       CAST(CASE WHEN c.round > 0
                 THEN (SELECT n * (n - 1) FROM params)
                 ELSE 0 END AS BIGINT) AS msgs_alltoall
FROM per_round c
LEFT JOIN per_round p ON c.round = p.round + 1
"""

QUERIES["gossip_dissemination"] = gossip_dissemination
ORACLES["gossip_dissemination"] = GOSSIP_DISSEMINATION_SQL


def failure_detection_census(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The reference's staleness rule applied to the events heartbeat
    log (node = user_id, heartbeat = ts): a node whose last heartbeat
    is older than 3.5x the ping period is declared FAILED
    (DetectFailures, detect_failures.go:191: `> 3.5` seconds over a
    1s loop — same ratio, this corpus's 27000s nominal period).
    Per node: heartbeat count, last heartbeat, the declare time
    (last + threshold), the FALSE-detection census (mid-trace
    silences longer than the threshold — each one is a moment every
    observer would have wrongly marked the node failed; the
    reference's own comment flags exactly this risk,
    detect_failures.go:70-71), and the worst silence.

    Scale: one lag-window partitioned by node (bounded per-key
    state), then a partial-agg rollup — no global window, no
    driver-side iteration."""
    ev = load_table(spark, "events", sf_dir).select(
        F.col("user_id").alias("node"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    w = Window.partitionBy("node").orderBy("ts", "event_id")
    # exact integer microseconds on both engines (truncate-to-second
    # before subtracting vs epoch()'s fractional-double rounding was
    # a measured off-by-one against the oracle)
    gaps = ev.withColumn(
        "gap_us",
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w),
    )
    return (
        gaps.groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_heartbeats"),
            F.max("ts").alias("last_ts"),
            F.sum(F.when(F.col("gap_us") > STALENESS_S * 1_000_000, 1)
                  .otherwise(0)).cast("long")
            .alias("n_false_detections"),
            F.expr("CAST(MAX(gap_us) DIV 1000000 AS BIGINT)")
            .alias("max_gap_s"),
        )
        .select(
            "node", "n_heartbeats", "last_ts",
            (F.col("last_ts")
             + F.expr(f"INTERVAL {STALENESS_S} SECOND"))
            .alias("detect_ts"),
            "n_false_detections", "max_gap_s",
        )
    )


FAILURE_DETECTION_CENSUS_SQL = f"""
WITH hb AS (
  SELECT user_id AS node, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT node,
       CAST(COUNT(*) AS BIGINT) AS n_heartbeats,
       MAX(ts) AS last_ts,
       MAX(ts) + INTERVAL {STALENESS_S} SECOND AS detect_ts,
       CAST(SUM(CASE WHEN gap_us > {STALENESS_S}::BIGINT * 1000000
                     THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_detections,
       CAST(MAX(gap_us) // 1000000 AS BIGINT) AS max_gap_s
FROM hb
GROUP BY node
"""

QUERIES["failure_detection_census"] = failure_detection_census
ORACLES["failure_detection_census"] = FAILURE_DETECTION_CENSUS_SQL


def membership_lww_merge(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Last-writer-wins membership-table merge (MergeTables,
    detect_failures.go:124-127: an incoming entry replaces the local
    one iff its LastTime is newer) over a corpus of observations:
    every event is observer user_id reporting subject slot
    event_id % LWW_SUBJECTS in state event_type at time ts. The
    converged table — what every node's Table array agrees on after
    all gossip settles — is the (ts, event_id)-latest observation
    per slot, plus how contended the slot was (observation and
    distinct-observer counts).

    Scale: per-slot top-1 via a rank window (WindowGroupLimit pushes
    the partial top-1 below the exchange) joined to a partial-agg
    rollup — both shuffle once on the slot key."""
    obs = load_table(spark, "events", sf_dir).select(
        (F.col("event_id") % LWW_SUBJECTS).alias("subject"),
        F.col("user_id").alias("observer"),
        F.col("event_type").alias("status"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    w = Window.partitionBy("subject").orderBy(
        F.desc("ts"), F.desc("event_id"))
    winner = (
        obs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("subject", "status",
                F.col("ts").alias("last_time"),
                F.col("observer").alias("reported_by"))
    )
    counts = obs.groupBy("subject").agg(
        F.count(F.lit(1)).cast("long").alias("n_observations"),
        F.countDistinct("observer").cast("long").alias("n_observers"),
    )
    return winner.join(counts, "subject").select(
        "subject", "status", "last_time", "reported_by",
        "n_observations", "n_observers")


MEMBERSHIP_LWW_MERGE_SQL = f"""
WITH obs AS (
  SELECT event_id % {LWW_SUBJECTS} AS subject,
         user_id AS observer, event_type AS status, ts, event_id
  FROM events
),
winner AS (
  SELECT subject, status, ts AS last_time, observer AS reported_by
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY subject ORDER BY ts DESC, event_id DESC) AS rk
    FROM obs
  ) WHERE rk = 1
),
counts AS (
  SELECT subject,
         CAST(COUNT(*) AS BIGINT) AS n_observations,
         CAST(COUNT(DISTINCT observer) AS BIGINT) AS n_observers
  FROM obs GROUP BY subject
)
SELECT w.subject, w.status, w.last_time, w.reported_by,
       c.n_observations, c.n_observers
FROM winner w JOIN counts c ON w.subject = c.subject
"""

QUERIES["membership_lww_merge"] = membership_lww_merge
ORACLES["membership_lww_merge"] = MEMBERSHIP_LWW_MERGE_SQL


# replica placement (reference: 4 replicas per file on the most-free
# servers — get_four_most_free_servers, file_system.go:150-175; on a
# failure each lost replica is re-placed on exactly ONE new server
# that does not already hold the file — RellocateFiles,
# file_system.go:725-770)
REPLICAS = 4
RING_NIBBLES = 10          # 40-bit ring positions
RING_BUCKET_SHIFT = 32     # bucket = pos >> 32 -> 256 ring arcs


def _ring_pos_spark(prefix: str, col: str) -> str:
    return _hex_conv(
        f"md5(concat('{prefix}:', CAST({col} AS STRING)))", RING_NIBBLES)


def _ring_pos_sql(prefix: str, col: str) -> str:
    return _hex_long(
        f"md5('{prefix}:' || CAST({col} AS VARCHAR))", RING_NIBBLES)


def _ring_index(spark: SparkSession, nodes: DataFrame) -> DataFrame:
    """(node, pos, ring_index) with ring_index dense 0..n-1 in
    (pos, node) order — WITHOUT a global ordered window: per-arc
    rank (partitioned window) + driver-stitched arc offsets (the
    256-row bucket histogram is membership metadata, the same
    prefix-sum stitch the partitioned running totals use)."""
    nodes = nodes.withColumn(
        "bucket", F.expr(f"pos div {2 ** RING_BUCKET_SHIFT}"))
    counts = {r["bucket"]: r["c"] for r in
              nodes.groupBy("bucket").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    offs, acc = {}, 0
    for b in sorted(counts):
        offs[b] = acc
        acc += counts[b]
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offs.items()], "bucket long, off long")
    w = Window.partitionBy("bucket").orderBy("pos", "node")
    return (
        nodes.join(F.broadcast(off_df), "bucket")
        .select("node", "pos",
                (F.row_number().over(w) - 1 + F.col("off"))
                .alias("ring_index"))
    )


def _placement(spark: SparkSession, ring: DataFrame,
               files: DataFrame, n_nodes: int) -> DataFrame:
    """(doc_id, node) replica pairs: each file's REPLICAS ring
    successors (first nodes at pos >= file pos, wrapping). The
    successor INDEX is an exact per-arc count (file x its own ~n/256
    arc's nodes, never file x cluster) + the stitched arc offset;
    replicas then come from one equi-join on ring_index."""
    fb = files.withColumn(
        "bucket", F.expr(f"fpos div {2 ** RING_BUCKET_SHIFT}"))
    arc = ring.withColumn(
        "bucket", F.expr(f"pos div {2 ** RING_BUCKET_SHIFT}"))
    # nodes strictly below fpos within the file's own arc
    below = (
        fb.join(arc.select("bucket", "pos"), "bucket", "left")
        .withColumn("lt", F.when(F.col("pos") < F.col("fpos"), 1)
                    .otherwise(0))
        .groupBy("doc_id", "fpos", "bucket")
        .agg(F.coalesce(F.sum("lt"), F.lit(0)).alias("in_arc"))
    )
    counts = {r["bucket"]: r["c"] for r in
              arc.groupBy("bucket").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    # offsets for EVERY arc (a file may land in a node-empty arc,
    # whose offset is still the cumulative node count before it)
    offs, acc = {}, 0
    for b in range(2 ** (RING_NIBBLES * 4 - RING_BUCKET_SHIFT)):
        offs[b] = acc
        acc += counts.get(b, 0)
    off_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in offs.items()],
        "bucket long, off long")
    idx = (
        below.join(F.broadcast(off_df), "bucket")
        .select("doc_id",
                (F.col("off") + F.col("in_arc")).alias("idx"))
    )
    return (
        idx.select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, {REPLICAS - 1})"))
            .alias("i"), "idx")
        .select("doc_id",
                ((F.col("idx") + F.col("i")) % n_nodes)
                .alias("ring_index"))
        .join(ring.select("ring_index", "node"), "ring_index")
        .select("doc_id", "node")
    )


def replica_rebalance_census(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """What the departure of one node does to replica placement —
    the reference's RellocateFiles moment (file_system.go:725: every
    file on the failed server gets exactly ONE new holder), restated
    with the placement policy a 1000-node deployment would use:
    REPLICAS=4 ring successors under consistent hashing (the
    reference places on the 4 most-free servers — a load signal a
    deterministic census cannot replay; the ring preserves the
    properties the census certifies: 4 holders per file, and on a
    departure exactly one new holder per affected file, everything
    else untouched — minimal disruption, which RellocateFiles
    achieves imperatively).

    Nodes = customer keys on a 40-bit md5 ring; files = documents;
    the departing node is the origin (min key — the same node whose
    LEAVING event gossip_dissemination floods). Output per node:
    replicas held before, after, and gained (the receive load of the
    rebalance; the departed node shows files_after = 0).

    Scale shape: ring indexing is a per-arc rank + driver-stitched
    256-arc offsets (membership metadata, not data); the successor
    index is an exact per-arc count (file x ~n/256 arc nodes, never
    file x cluster); replicas come from one ring_index equi-join;
    the before/after diff is a left-anti join on (doc, node). No
    global window, no cross join, no O(files x cluster) work."""
    cust = load_table(spark, "customer", sf_dir)
    row = cust.agg(F.count(F.lit(1)).alias("n"),
                   F.min("c_custkey").alias("leaver")).first()
    n, leaver = int(row["n"]), int(row["leaver"])

    nodes = cust.select(
        F.col("c_custkey").cast("long").alias("node"),
        F.expr(_ring_pos_spark("n", "c_custkey")).alias("pos"))
    files = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(_ring_pos_spark("f", "doc_id")).alias("fpos"))

    ring_b = _ring_index(spark, nodes).transform(cut_deep)
    ring_a = _ring_index(
        spark, nodes.filter(F.col("node") != leaver)).transform(cut_deep)
    # each placement is consumed by THREE subtrees below (the
    # anti-join diff and both per-node rollups) — without a barrier
    # the arc join + successor-index aggregate replayed 3x per ring
    # (r10: one cut each, measured plan went from 6 placement builds
    # to 2)
    before = _placement(spark, ring_b, files, n).transform(cut)
    after = _placement(spark, ring_a, files, n - 1).transform(cut)

    gained = (
        after.join(before, ["doc_id", "node"], "left_anti")
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gained"))
    )
    nb = before.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("files_before"))
    na = after.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("files_after"))
    return (
        nodes.select("node")
        .join(nb, "node", "left")
        .join(na, "node", "left")
        .join(gained, "node", "left")
        .select(
            "node",
            F.coalesce("files_before", F.lit(0)).cast("long")
            .alias("files_before"),
            F.coalesce("files_after", F.lit(0)).cast("long")
            .alias("files_after"),
            F.coalesce("n_gained", F.lit(0)).cast("long")
            .alias("n_gained"),
        )
    )



def _rebalance_placement_sql(ring_sel: str, n_sql: str) -> str:
    """DuckDB twin of _placement over the node rows yielded by
    `ring_sel`: global ROW_NUMBER ring indexing (fine in the oracle
    engine), and the successor index via ONE union window — nodes and
    files on a common (pos, is_node, id) axis with a running node
    count, so a file's idx = nodes strictly before it; at equal pos
    the file sorts BEFORE the node (is_node breaks the tie), so that
    node still counts as the file's successor, matching the Spark
    side's strict pos < fpos count."""
    return f"""
  SELECT p.doc_id, r.node
  FROM (
    SELECT u.doc_id,
           (COALESCE(u.idx, 0) + s.i) % ({n_sql}) AS ring_index
    FROM (
      SELECT doc_id, is_node,
             SUM(is_node) OVER (
               ORDER BY pos, is_node, id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS idx
      FROM (
        SELECT pos, 1 AS is_node, node AS id,
               CAST(NULL AS BIGINT) AS doc_id
        FROM ({ring_sel})
        UNION ALL
        SELECT fpos AS pos, 0 AS is_node, doc_id AS id, doc_id
        FROM files
      )
    ) u
    CROSS JOIN generate_series(0, {REPLICAS - 1}) AS s(i)
    WHERE u.is_node = 0
  ) p
  JOIN (
    SELECT node,
           ROW_NUMBER() OVER (ORDER BY pos, node) - 1 AS ring_index
    FROM ({ring_sel})
  ) r ON p.ring_index = r.ring_index
"""


_RING_ALL = "SELECT node, pos FROM ring"
_RING_AFTER = ("SELECT node, pos FROM ring "
               "WHERE node != (SELECT leaver FROM params)")

REPLICA_REBALANCE_CENSUS_SQL = f"""
WITH params AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(c_custkey) AS BIGINT) AS leaver
  FROM customer
),
ring AS (
  SELECT CAST(c_custkey AS BIGINT) AS node,
         {_ring_pos_sql("n", "c_custkey")} AS pos
  FROM customer
),
files AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {_ring_pos_sql("f", "doc_id")} AS fpos
  FROM documents
),
before_p AS (
{_rebalance_placement_sql(_RING_ALL, "SELECT n FROM params")}
),
after_p AS (
{_rebalance_placement_sql(_RING_AFTER, "SELECT n - 1 FROM params")}
),
gained AS (
  SELECT a.node, CAST(COUNT(*) AS BIGINT) AS n_gained
  FROM after_p a
  LEFT JOIN before_p b
    ON a.doc_id = b.doc_id AND a.node = b.node
  WHERE b.node IS NULL
  GROUP BY a.node
),
nb AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS files_before
       FROM before_p GROUP BY node),
na AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS files_after
       FROM after_p GROUP BY node)
SELECT r.node,
       CAST(COALESCE(nb.files_before, 0) AS BIGINT) AS files_before,
       CAST(COALESCE(na.files_after, 0) AS BIGINT) AS files_after,
       CAST(COALESCE(g.n_gained, 0) AS BIGINT) AS n_gained
FROM ring r
LEFT JOIN nb ON r.node = nb.node
LEFT JOIN na ON r.node = na.node
LEFT JOIN gained g ON r.node = g.node
"""

QUERIES["replica_rebalance_census"] = replica_rebalance_census
ORACLES["replica_rebalance_census"] = REPLICA_REBALANCE_CENSUS_SQL
