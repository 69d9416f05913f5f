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
from distributed_system_mapreduce_spark.lineage import cut, cut_deep


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
    edges = strong_edges(li, BFS_SUPPORT).transform(cut)
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
            # LAZY per-hop barrier (r10): lineage still truncates, but
            # the hop materializes inside the single final action (its
            # min-dist shuffle is computed once and reused by both
            # consumers) instead of paying one eager job per hop
            .transform(lambda df: cut(df, eager=False, deep=True))
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
    alive = strong_edges(li, KCORE_SUPPORT).transform(cut)
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
            # LAZY per-round peel (r10): the checkpoint RDD still pins
            # this round's physical plan (constant plan size), but
            # materialization now happens inside the single final
            # action — the localCheckpoint cache serves all three
            # next-round consumers — instead of one eager job per round
            .transform(lambda df: cut(df, eager=False, deep=True))
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


# ------------------------------------------------------- user_traj_topk
TRAJ_PANEL_MOD = 50     # query panel: user_id % 50 == 0 ...
TRAJ_PANEL_CAP = 32     # ... and user_id < 50 * 32 (bounded, like ANN)
TRAJ_TOPK = 5


def user_traj_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behavioral-trajectory similarity (the distributed top-k
    trajectory search problem, REPOSE ICDE'21 / top-k similarity
    sessions EDBT'20, on event paths): each query-panel user's
    arrival-ordered event-type sequence becomes a distinct
    path-trigram set; candidate users must SHARE at least one trigram
    (equi-join on trigram — the pruning tries' role); exact Jaccard
    over the two trigram sets ranks the top 5 with a deterministic
    tie-break.

    Shape: one events shuffle to per-user ordered sequences
    (sort_array over (us, event_id) — exact arrival order, no window)
    — localCheckpointed: the panel filter, the candidate explode, and
    both verify sides all reference it, and each replayed the events
    scan + sequence shuffle otherwise (r7 scan audit: 4 scans, now
    1); trigram explode only for the candidate join, set algebra
    (array_intersect sizes) for the exact verify — candidates->verify,
    never user x user. The panel is a constant 32 users, so the plan
    is linear in users at any scale."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        "event_id", "event_type")
    seq = (
        ev.groupBy("user_id")
        .agg(F.expr(
            "transform(sort_array(collect_list(struct(us, event_id, "
            "event_type))), s -> s.event_type)").alias("types"))
        .filter(F.size("types") >= 3)
        .select(
            "user_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(types) - 2), "
                "i -> concat(element_at(types, i), '>', "
                "element_at(types, i+1), '>', "
                "element_at(types, i+2))))").alias("trig"),
        )
        .transform(cut)
    )
    qpanel = seq.filter(
        (F.col("user_id") % TRAJ_PANEL_MOD == 0)
        & (F.col("user_id") < TRAJ_PANEL_MOD * TRAJ_PANEL_CAP))
    qx = qpanel.select(F.col("user_id").alias("qu"),
                       F.explode("trig").alias("t"))
    cx = seq.select(F.col("user_id").alias("cu"),
                    F.explode("trig").alias("t"))
    cand = (
        qx.join(cx, "t")
        .filter(F.col("qu") != F.col("cu"))
        .select("qu", "cu").distinct()
    )
    a = qpanel.select(F.col("user_id").alias("qu"),
                      F.col("trig").alias("ta"))
    b = seq.select(F.col("user_id").alias("cu"),
                   F.col("trig").alias("tb"))
    pairs = (
        cand.join(a, "qu").join(b, "cu")
        .select(
            "qu", "cu",
            F.size(F.array_intersect("ta", "tb")).cast("long")
            .alias("inter"),
            (F.size("ta") + F.size("tb")
             - F.size(F.array_intersect("ta", "tb"))).cast("long")
            .alias("uni"),
        )
        .withColumn("jaccard", F.col("inter").cast("double")
                    / F.col("uni").cast("double"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qu").orderBy(
        F.desc("jaccard"), F.asc("cu"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TRAJ_TOPK)
        .select(F.col("qu").alias("query_user"),
                F.col("cu").alias("neighbor_user"),
                "inter", "uni", "jaccard", "rank")
    )


USER_TRAJ_TOPK_SQL = f"""
WITH seq0 AS (
  SELECT user_id,
         list_transform(list_sort(list({{'us': CAST(epoch_us(ts) AS
           BIGINT), 'event_id': event_id, 'event_type': event_type}})),
           s -> s.event_type) AS types
  FROM events GROUP BY user_id
),
seq AS (
  SELECT user_id,
         list_distinct(list_transform(range(1, len(types) - 1),
           i -> types[i] || '>' || types[i+1] || '>' || types[i+2]))
           AS trig
  FROM seq0 WHERE len(types) >= 3
),
qpanel AS (
  SELECT * FROM seq
  WHERE user_id % {TRAJ_PANEL_MOD} = 0
    AND user_id < {TRAJ_PANEL_MOD} * {TRAJ_PANEL_CAP}
),
cand AS (
  SELECT DISTINCT q.user_id AS qu, c.user_id AS cu
  FROM (SELECT user_id, unnest(trig) AS t FROM qpanel) q
  JOIN (SELECT user_id, unnest(trig) AS t FROM seq) c USING (t)
  WHERE q.user_id <> c.user_id
),
pairs AS (
  SELECT qu, cu,
         CAST(len(list_intersect(a.trig, b.trig)) AS BIGINT) AS inter,
         CAST(len(a.trig) + len(b.trig)
              - len(list_intersect(a.trig, b.trig)) AS BIGINT) AS uni
  FROM cand
  JOIN qpanel a ON cand.qu = a.user_id
  JOIN seq b ON cand.cu = b.user_id
)
SELECT query_user, neighbor_user, inter, uni, jaccard, rank FROM (
  SELECT qu AS query_user, cu AS neighbor_user, inter, uni,
         CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard,
         ROW_NUMBER() OVER (PARTITION BY qu
           ORDER BY CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) DESC,
                    cu ASC) AS rank
  FROM pairs
)
WHERE rank <= {TRAJ_TOPK}
"""

QUERIES["user_traj_topk"] = user_traj_topk
ORACLES["user_traj_topk"] = USER_TRAJ_TOPK_SQL
