"""Relational wave 17: daily quantile bands and BFS reachability.

- events_daily_quantiles: per (type, day) exact p50/p90 value bands —
  the percentile ribbon behind every latency/metric dashboard.
- graph_bfs_reach: BFS frontier census from a deterministic seed on
  the strong co-purchase graph — how much of the graph is within
  1, 2, 3 hops (the reachability sibling of the degree/triangle/
  community health checks).

Reference parity: SURVEY §2.C extensions (maple+juice pairs in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


# ------------------------------------------------- events_daily_quantiles
def events_daily_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 daily value bands per event type — the
    percentile ribbon a metrics dashboard draws. One array-percentile
    aggregate per (type, day) group (bounded group count — type x
    calendar; the interpolation matches DuckDB quantile_cont
    bit-for-bit, the price_quantiles precedent); swap
    approx_percentile if the group key were unbounded."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("percentile(value, array(0.5, 0.9))").alias("qs"),
        )
        .select(
            "event_type", "day", "n",
            F.col("qs")[0].alias("p50"),
            F.col("qs")[1].alias("p90"),
        )
    )


EVENTS_DAILY_QUANTILES_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90
FROM events
GROUP BY event_type, CAST(ts AS DATE)
"""


# ------------------------------------------------------- graph_bfs_reach
BFS_SUPPORT = 2  # strong-tie threshold, as in triangle_count/community_lpa
BFS_HOPS = 3


def graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability census from a deterministic seed (the
    smallest node id) on the strong co-purchase graph: how many
    nodes sit at distance 1, 2, 3 — the connectivity probe that
    complements the degree/triangle/community health checks.

    Shape: the symmetric edge table is built once and
    localCheckpoint'd (the community_lpa shape); each hop is ONE
    join + partial-agg min-distance update over the frontier —
    fixed-round unrolled BFS, state is the (node, dist) table, no
    driver-side iteration state beyond the loop counter. The oracle
    is an independent recursive-CTE shortest-path formulation."""
    from distributed_system_mapreduce_spark.functions.graphs import (
        strong_edges,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = strong_edges(li, BFS_SUPPORT).localCheckpoint()
    seed = edges.agg(F.min("src").alias("node")).withColumn(
        "dist", F.lit(0).cast("long"))
    dist = seed
    for hop in range(1, BFS_HOPS + 1):
        frontier = dist.filter(F.col("dist") == hop - 1)
        reached = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"),
                    F.lit(hop).cast("long").alias("dist"))
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return (
        dist.groupBy("dist")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
             F.min("node").alias("min_node"))
    )


GRAPH_BFS_REACH_SQL = f"""
WITH RECURSIVE lp AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
und AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {BFS_SUPPORT}
),
edges AS (
  SELECT u AS src, v AS dst FROM und
  UNION ALL
  SELECT v, u FROM und
),
walk(node, dist) AS (
  SELECT MIN(src), CAST(0 AS BIGINT) FROM edges
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {BFS_HOPS}
),
best AS (
  SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
)
SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(node) AS min_node
FROM best GROUP BY dist
"""


QUERIES = {
    "events_daily_quantiles": events_daily_quantiles,
    "graph_bfs_reach": graph_bfs_reach,
}

ORACLES = {
    "events_daily_quantiles": EVENTS_DAILY_QUANTILES_SQL,
    "graph_bfs_reach": GRAPH_BFS_REACH_SQL,
}


# ---------------------------------------------------------- kcore_census
KCORE_K = 3
KCORE_ROUNDS = 8
KCORE_SUPPORT = 2


def kcore_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the strong co-purchase graph: iteratively peel nodes
    of degree < K until stable (KCORE_ROUNDS fixed rounds — fixpoint
    well before that on co-purchase graphs; extra rounds are no-ops,
    so the fixed unroll is deterministic on both engines); report the
    surviving core size — the "dense interior" health metric that
    degree and triangle censuses only hint at.

    Shape: each round is one partial-agg degree count + one semi-join
    of the edge table against surviving endpoints (both sides), off a
    localCheckpointed symmetric edge table (the community_lpa
    discipline). The oracle unrolls the same rounds as chained CTEs —
    an independent formulation of the same peel."""
    from distributed_system_mapreduce_spark.functions.graphs import (
        strong_edges,
    )

    li = load_table(spark, "lineitem", sf_dir)
    alive = strong_edges(li, KCORE_SUPPORT).localCheckpoint()
    for _ in range(KCORE_ROUNDS):
        keep = (
            alive.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select(F.col("src").alias("node"))
        )
        alive = (
            alive.join(keep.withColumnRenamed("node", "src"), "src",
                       "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst",
                  "left_semi")
            .localCheckpoint()
        )
    return alive.agg(
        F.lit(KCORE_K).cast("long").alias("k"),
        F.lit(KCORE_ROUNDS).cast("long").alias("n_rounds"),
        F.countDistinct("src").cast("long").alias("n_core_nodes"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_core_edges"),
    )


def _kcore_sql() -> str:
    rounds = []
    prev = "edges"
    for i in range(KCORE_ROUNDS):
        # MATERIALIZED: each round references the previous CTE three
        # times (degree + both endpoint joins); default inlining would
        # expand the base subtree 3^rounds times and exhaust file
        # handles re-opening the parquet
        rounds.append(
            f"k{i} AS MATERIALIZED (SELECT src AS node FROM {prev} "
            f"GROUP BY src HAVING COUNT(*) >= {KCORE_K}),\n"
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e "
            f"JOIN k{i} a ON e.src = a.node "
            f"JOIN k{i} b ON e.dst = b.node)"
        )
        prev = f"e{i}"
    return (
        f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {KCORE_SUPPORT}
),
edges AS (
  SELECT u AS src, v AS dst FROM und
  UNION ALL
  SELECT v, u FROM und
),
"""
        + ",\n".join(rounds)
        + f"""
SELECT CAST({KCORE_K} AS BIGINT) AS k,
       CAST({KCORE_ROUNDS} AS BIGINT) AS n_rounds,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_core_nodes,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_core_edges
FROM {prev}
"""
    )


KCORE_CENSUS_SQL = _kcore_sql()

QUERIES["kcore_census"] = kcore_census
ORACLES["kcore_census"] = KCORE_CENSUS_SQL
