"""Relational wave 6: governance and growth-accounting shapes —
k-anonymity risk census (the privacy gate run before releasing an
events extract), first-seen user growth (the acquisition curve), and
common-neighbor link prediction (the recommender-adjacent graph
query over the co-purchase graph).

Exactness: counts and distinct counts are integers end-to-end; the
single share ratio is one int/int double division after aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut, cut_lazy

# ------------------------------------------------- k-anonymity census
# Quasi-identifier = (event_type, day): the release-granularity cell.
# A cell with < K distinct users is re-identifiable; the census says
# how much suppression a K-anonymous release would need.
K_ANON = 5


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: how many (type, day) release cells exist, how
    many fall below the K-anonymity threshold, and what share of
    user-day observations sits in those risky cells — the governance
    query run before handing an events extract to a third party.

    Shape: one countDistinct per cell (two-phase exact distinct on the
    (type, day) key — the natural release granularity), then a
    partial-agg rollup onto the bounded type key. Linear, two
    shuffles, no window."""
    ev = load_table(spark, "events", sf_dir)
    cells = (
        ev.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").cast("long").alias("cell_users"))
    )
    small = F.col("cell_users") < K_ANON
    agg = cells.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum(small.cast("long")).cast("long").alias("n_small_cells"),
        F.sum(F.when(small, F.col("cell_users")).otherwise(0))
        .cast("long").alias("users_at_risk"),
        F.sum("cell_users").cast("long").alias("user_cells"),
    )
    return agg.select(
        "event_type", "n_cells", "n_small_cells", "users_at_risk",
        "user_cells",
        (F.col("users_at_risk").cast("double")
         / F.col("user_cells").cast("double")).alias("risk_share"),
    )


K_ANONYMITY_SQL = f"""
SELECT event_type, n_cells, n_small_cells, users_at_risk, user_cells,
       CAST(users_at_risk AS DOUBLE) / CAST(user_cells AS DOUBLE)
         AS risk_share
FROM (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(CASE WHEN cell_users < {K_ANON} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_small_cells,
         CAST(SUM(CASE WHEN cell_users < {K_ANON} THEN cell_users
                       ELSE 0 END) AS BIGINT) AS users_at_risk,
         CAST(SUM(cell_users) AS BIGINT) AS user_cells
  FROM (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cell_users
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
  )
  GROUP BY event_type
)
"""


# ---------------------------------------------------- user growth curve
def user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition curve: per day, how many users were seen for the
    FIRST time, and the cumulative user base through that day.

    Shape: min(first day) per user (one user_id shuffle), daily counts
    (bounded calendar), then the cumulative sum via a triangular
    broadcast self-join over the tiny aggregated calendar — the same
    no-global-window pattern as vocab_growth (a window over all days
    would serialize onto one task; the calendar table is O(days), so
    the triangular join is O(days^2) rows on broadcast data)."""
    from distributed_system_mapreduce_spark.functions.rollups import (
        triangular_cumsum,
    )

    ev = load_table(spark, "events", sf_dir)
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"))
    daily = first.groupBy("first_day").agg(
        F.count("*").cast("long").alias("new_users"))
    return triangular_cumsum(daily, "first_day", "new_users", "cum_users")


USER_GROWTH_SQL = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first GROUP BY first_day
)
SELECT a.first_day, a.new_users,
       CAST(SUM(b.new_users) AS BIGINT) AS cum_users
FROM daily a JOIN daily b ON b.first_day <= a.first_day
GROUP BY a.first_day, a.new_users
"""


# -------------------------------------- common-neighbor link prediction
_LP_SUPPORT = 2   # strong-tie threshold, same as triangle_count
_LP_TOPK = 20


def link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the strong co-purchase graph: for part
    pairs NOT already connected, count common neighbors (the
    classic 'people who bought X also bought Y' candidate score) and
    keep the top-20 — wedge counting, the same primitive as
    triangle_count pointed at the open wedges instead of the closed
    ones.

    Shape: canonical u<v strong edges (linear in orders), symmetrize,
    wedge self-join on the mid node, partial-agg count per candidate
    pair, left-anti against existing edges, TakeOrderedAndProject
    top-20 with a full (score desc, u, v) tie-break. At 100 TB the
    wedge join is bounded by the degree census (graph_degree_dist) —
    hub nodes get split/capped before this runs, as with any
    wedge-based algorithm."""
    from distributed_system_mapreduce_spark.functions.graphs import (
        strong_undirected,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = (
        strong_undirected(li, _LP_SUPPORT)
        .select("u", "v")
        .transform(cut_lazy)
    )
    sym = edges.union(edges.select(F.col("v"), F.col("u")))
    s1 = sym.select(F.col("u").alias("x"), F.col("v").alias("mid"))
    s2 = sym.select(F.col("u").alias("mid2"), F.col("v").alias("y"))
    cand = (
        s1.join(s2, (F.col("mid") == F.col("mid2"))
                & (F.col("x") < F.col("y")))
        .groupBy(F.col("x").alias("u"), F.col("y").alias("v"))
        .agg(F.count("*").cast("long").alias("common_neighbors"))
    )
    open_pairs = cand.join(edges, ["u", "v"], "left_anti")
    return (
        open_pairs
        .orderBy(F.desc("common_neighbors"), F.asc("u"), F.asc("v"))
        .limit(_LP_TOPK)
    )


LINK_PREDICTION_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_LP_SUPPORT}
),
sym AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
cand AS (
  SELECT s1.u AS u, s2.v AS v, CAST(COUNT(*) AS BIGINT)
           AS common_neighbors
  FROM sym s1 JOIN sym s2 ON s1.v = s2.u AND s1.u < s2.v
  GROUP BY s1.u, s2.v
)
SELECT u, v, common_neighbors
FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = c.u AND e.v = c.v)
ORDER BY common_neighbors DESC, u ASC, v ASC
LIMIT {_LP_TOPK}
"""


# ------------------------------------------------ join size estimation
# The cost-based-optimizer primitive: |A join B on k| =
# SUM over matching keys of cnt_A(k) * cnt_B(k) — computed from two
# per-key count tables, never by executing the join. This is how a
# planner (or a capacity review) sizes a 100 TB fact-fact join before
# committing a shuffle to it; the count tables are each one partial-agg
# shuffle, and their join is broadcast-sized for dimension edges.
_JOIN_EDGES = [
    ("orders-lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer-orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("part-lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier-lineitem", "supplier", "s_suppkey", "lineitem",
     "l_suppkey"),
]


def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size audit of the star schema's FK edges: for each edge,
    the exact join output cardinality and the max per-key fanout,
    derived from per-key count tables WITHOUT executing the join —
    the arithmetic behind every CBO row estimate and skew alarm
    (max_fanout is the number AQE's skew-join threshold watches).

    Shape: lineitem carries THREE of the four edges' child keys, so
    its per-key count tables come out of ONE scan — each row explodes
    into int-tagged (edge, key) pairs and one shuffle counts all
    three (the join_key_skew idiom; the per-edge-loop shape scanned
    lineitem three times, r7 scan audit). Per edge: a key-count
    equi-join (broadcast for dimension sides under AQE) folded to a
    1-row summary; the bounded edge summaries union. Products of
    per-key counts are BIGINT end-to-end."""
    li_edges = [(i, e) for i, e in enumerate(_JOIN_EDGES)
                if e[3] == "lineitem"]
    li = load_table(spark, "lineitem", sf_dir)
    li_counts = (
        li.select(F.explode(F.array(*[
            F.struct(F.lit(i).cast("int").alias("eid"),
                     F.col(rk).cast("long").alias("k"))
            for i, (_, _, _, _, rk) in li_edges
        ])).alias("e")).select("e.*")
        .groupBy("eid", "k").agg(F.count(F.lit(1)).alias("cb"))
        # three edge branches read this; without the barrier each
        # replays the explode + shuffle (and the scan with it)
        .transform(cut)
    )
    out = None
    for i, (edge, lt, lk, rt, rk) in enumerate(_JOIN_EDGES):
        left = load_table(spark, lt, sf_dir).select(
            F.col(lk).alias("k"))
        lc = left.groupBy("k").agg(F.count("*").alias("ca"))
        if rt == "lineitem":
            rc = li_counts.filter(F.col("eid") == i).select("k", "cb")
        else:
            rc = load_table(spark, rt, sf_dir).select(
                F.col(rk).alias("k")
            ).groupBy("k").agg(F.count("*").alias("cb"))
        j = lc.join(rc, "k")
        row = j.agg(
            F.count("*").cast("long").alias("matching_keys"),
            F.sum(F.col("ca") * F.col("cb")).cast("long")
            .alias("join_rows"),
            F.max(F.col("ca") * F.col("cb")).cast("long")
            .alias("max_key_fanout"),
        ).select(
            F.lit(edge).alias("edge"),
            "matching_keys", "join_rows", "max_key_fanout",
        )
        out = row if out is None else out.unionByName(row)
    return out


JOIN_SIZE_ESTIMATE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS edge,
       CAST(COUNT(*) AS BIGINT) AS matching_keys,
       CAST(SUM(ca * cb) AS BIGINT) AS join_rows,
       CAST(MAX(ca * cb) AS BIGINT) AS max_key_fanout
FROM (SELECT {lk} AS k, CAST(COUNT(*) AS BIGINT) AS ca
      FROM {lt} GROUP BY {lk}) l
JOIN (SELECT {rk} AS k, CAST(COUNT(*) AS BIGINT) AS cb
      FROM {rt} GROUP BY {rk}) r USING (k)"""
    for edge, lt, lk, rt, rk in _JOIN_EDGES
)


# ------------------------------------------------ interval concurrency
CONC_WINDOW_S = 900  # each event holds a resource for 15 minutes


def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type: each event opens a 15-minute
    interval [ts, ts+900s); report the maximum number of
    simultaneously open intervals and the earliest instant the peak
    is reached — the interval-overlap / capacity-planning sweep
    (max concurrent sessions, peak connection count).

    Shape: decompose every interval into a +1 start and a -1 end
    delta, then take an EXACT running sum without any global window —
    per-(type, day) cumsum windows stitched with an exclusive
    per-day prefix computed by a window over the calendar-BOUNDED
    (type, day) totals table (the orders_backlog discipline). The
    delta ordering (t, d, event_id) is total, so every per-row
    running value — and therefore the argmax row — is deterministic
    in both engines; ends sort before coincident starts, making
    boundary-touching intervals non-overlapping.
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", "ts", "event_id")
    end_ts = F.expr(f"ts + INTERVAL {CONC_WINDOW_S} SECONDS")
    deltas = (
        ev.select("event_type", F.col("ts").alias("t"),
                  F.lit(1).alias("d"), "event_id")
        .unionByName(
            ev.select("event_type", end_ts.alias("t"),
                      F.lit(-1).alias("d"), "event_id"))
        .withColumn("day", F.to_date("t"))
    )
    wday = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "d", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    day_tot = deltas.groupBy("event_type", "day").agg(
        F.sum("d").alias("dtot"))
    woff = (
        Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = day_tot.select(
        "event_type", "day",
        F.coalesce(F.sum("dtot").over(woff), F.lit(0)).alias("off"))
    cur = (
        deltas.withColumn("run", F.sum("d").over(wday))
        .join(F.broadcast(offs), ["event_type", "day"])
        .select("event_type", "t",
                (F.col("run") + F.col("off")).alias("cur"))
        # three consumers (mx, the argmax filter, and offs' shared
        # deltas parent) — cut lineage so the union + cumsum window
        # evaluates once, not per consumer
        .transform(cut)
    )
    mx = cur.groupBy("event_type").agg(
        F.max("cur").alias("max_concurrent"))
    return (
        cur.join(F.broadcast(mx), "event_type")
        .filter(F.col("cur") == F.col("max_concurrent"))
        .groupBy("event_type")
        .agg(F.max("cur").cast("bigint").alias("max_concurrent"),
             F.min("t").alias("peak_ts"))
    )


EVENTS_CONCURRENCY_SQL = f"""
WITH deltas AS (
  SELECT event_type, ts AS t, 1 AS d, event_id FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL {CONC_WINDOW_S} SECOND, -1, event_id
  FROM events
),
cur AS (
  SELECT event_type, t,
         SUM(d) OVER (PARTITION BY event_type
                      ORDER BY t, d, event_id
                      ROWS UNBOUNDED PRECEDING) AS cur
  FROM deltas
),
mx AS (
  SELECT event_type, MAX(cur) AS m FROM cur GROUP BY event_type
)
SELECT c.event_type, CAST(MAX(c.cur) AS BIGINT) AS max_concurrent,
       MIN(c.t) AS peak_ts
FROM cur c JOIN mx ON c.event_type = mx.event_type AND c.cur = mx.m
GROUP BY c.event_type
"""


QUERIES = {
    "k_anonymity": k_anonymity,
    "user_growth": user_growth,
    "link_prediction": link_prediction,
    "join_size_estimate": join_size_estimate,
    "events_concurrency": events_concurrency,
}

ORACLES = {
    "k_anonymity": K_ANONYMITY_SQL,
    "user_growth": USER_GROWTH_SQL,
    "link_prediction": LINK_PREDICTION_SQL,
    "join_size_estimate": JOIN_SIZE_ESTIMATE_SQL,
    "events_concurrency": EVENTS_CONCURRENCY_SQL,
}
