"""Relational wave 4: Markov transition mining, inter-arrival
statistics, and an iterative graph ranking (PageRank) over the
co-purchase graph.

Reference analogue: these are multi-round maple/juice chains (the
reference's demo apps are exactly this shape — per-key shuffle rounds,
e.g. the two-round vote pipeline, maple_vote_two.go + juice_vote_two.go);
here each is one Catalyst plan (the PageRank rounds unrolled into it).

Exactness discipline matches relational.py: integer arithmetic
end-to-end where possible; doubles only as a single final division of
exact integers; PageRank runs entirely in scaled BIGINT arithmetic
(floor division) so every round is bit-identical across engines —
float PageRank would be summation-order-dependent and unhashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions: for each ordered pair of event
    types, how often does a user's next event follow the previous, and
    with what probability (row-normalized per source type).

    Plan: lead() window partitioned by user_id (never global), one
    partial-agg shuffle over at most |types|^2 groups; the normalizing
    total is a window over the already-aggregated (tiny, bounded)
    matrix, not the raw stream. Probability is ONE division of exact
    ints -> deterministic double.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("t_from"),
        F.lead("event_type", 1).over(w).alias("t_to"),
    ).where(F.col("t_to").isNotNull())
    counts = pairs.groupBy("t_from", "t_to").agg(
        F.count("*").alias("n_trans"))
    wtot = Window.partitionBy("t_from")
    return counts.select(
        "t_from", "t_to", "n_trans",
        (F.col("n_trans").cast("double")
         / F.sum("n_trans").over(wtot).cast("double")).alias("p"),
    )


EVENTS_TRANSITION_SQL = """
WITH pairs AS (
  SELECT event_type AS t_from,
         LEAD(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS t_to
  FROM events
),
c AS (
  SELECT t_from, t_to, COUNT(*) AS n_trans
  FROM pairs WHERE t_to IS NOT NULL
  GROUP BY t_from, t_to
)
SELECT t_from, t_to, n_trans,
       CAST(n_trans AS DOUBLE)
         / CAST(SUM(n_trans) OVER (PARTITION BY t_from) AS DOUBLE) AS p
FROM c
"""


def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type: for each event,
    the time since the same user's previous event (any type), rolled
    up by the type of the LATER event — the "how long until a user
    does X" latency profile.

    Gaps are exact integer MICROSECONDS (unix_micros / epoch_us agree
    bit-for-bit); min/max/sum stay integral, the mean is one final
    division to double. lag() window partitioned by user_id.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the reader yields TIMESTAMP_NTZ; the session is UTC-pinned
    # (tables.load_table), so the NTZ -> TZ cast is wall-clock
    # identity and unix_micros matches DuckDB's epoch_us exactly
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "event_type",
        (us - F.lag(us, 1).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    n = F.count("*")
    return gaps.groupBy("event_type").agg(
        n.alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").cast("long").alias("sum_gap_us"),
        (F.sum("gap_us").cast("double")
         / (n * F.lit(1000000)).cast("double")).alias("avg_gap_s"),
    )


EVENTS_INTER_ARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts), 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       MIN(gap_us) AS min_gap_us,
       MAX(gap_us) AS max_gap_us,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(SUM(gap_us) AS DOUBLE)
         / CAST(COUNT(*) * 1000000 AS DOUBLE) AS avg_gap_s
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


# PageRank in scaled integer arithmetic: rank mass is BIGINT in units
# of 1e-12 (SCALE), damping 0.85 applied as (85 * x) div 100, floor
# division throughout. Every operation (int sum, int floor-div) is
# associative-or-deterministic in both engines, so 3 rounds of power
# iteration produce IDENTICAL bits — which is what makes an iterative
# graph algorithm value-hashable cross-engine at all.
_PR_SCALE = 10**12
_PR_ROUNDS = 3


def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph (parts are nodes; an edge
    joins two parts appearing in the same order), 3 power-iteration
    rounds, damping 0.85 — "which parts sit at the center of the
    catalog". Top 20 by final rank.

    Scale shape: the edge build is the basket self-join keyed on
    l_orderkey (fan-out bounded by lines-per-order choose 2 — LINEAR
    in orders); each round is one equi-join shuffle (ranks onto edges
    by src) + one partial-agg shuffle (sum by dst). Degrees and the
    node count come from the same edge table. Rounds are unrolled
    into one plan off a localCheckpointed edge table (built once, read
    3x). Driver state: none beyond the final top-20.

    The reference would run this as 3 chained maple/juice rounds over
    SDFS intermediates (/root/reference/maple_juice/maple_juice.go:241
    exe contract); here the "intermediates" are Catalyst exchanges.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") != F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    # fold the degree in via a src-partitioned window (one shuffle, no
    # join) and checkpoint ONCE: each round then needs one equi-join +
    # one partial agg against this single materialized table
    edeg = edges.withColumn(
        "deg", F.count("*").over(Window.partitionBy("src"))
    ).localCheckpoint()
    nodes = edeg.select("src").distinct()
    n_nodes = F.broadcast(nodes.agg(F.count("*").alias("n")))
    # every node appears as src (the edge list is symmetric by
    # construction), so the src set is the node list
    ranks = nodes.crossJoin(n_nodes).select(
        F.col("src").alias("part"),
        F.expr(f"CAST({_PR_SCALE} AS BIGINT) div n").alias("rank"),
    )
    for _ in range(_PR_ROUNDS):
        incoming = (
            edeg.join(ranks, edeg["src"] == ranks["part"])
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div deg")).cast("long").alias("s"))
        )
        ranks = incoming.crossJoin(n_nodes).select(
            F.col("dst").alias("part"),
            F.expr(f"CAST({_PR_SCALE * 15} AS BIGINT) div (100 * n) "
                   "+ (85 * s) div 100").alias("rank"),
        )
    return ranks.orderBy(F.desc("rank"), "part").limit(20).select(
        F.col("part").alias("l_partkey"), "rank")


def _pr_round_sql(prev: str) -> str:
    return (
        f"SELECT e.dst AS part, "
        f"CAST({_PR_SCALE * 15} AS BIGINT) // (100 * n.n) "
        f"+ (85 * SUM(r.rank // d.deg)) // 100 AS rank "
        f"FROM edges e JOIN {prev} r ON e.src = r.part "
        f"JOIN deg d ON e.src = d.src CROSS JOIN n "
        f"GROUP BY e.dst, n.n"
    )


PAGERANK_PARTS_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT src AS part, CAST({_PR_SCALE} AS BIGINT) // n.n AS rank
       FROM deg CROSS JOIN n),
r1 AS ({_pr_round_sql('r0')}),
r2 AS ({_pr_round_sql('r1')}),
r3 AS ({_pr_round_sql('r2')})
SELECT part AS l_partkey, rank
FROM r3
ORDER BY rank DESC, part ASC
LIMIT 20
"""


QUERIES = {
    "events_transition_matrix": events_transition_matrix,
    "events_inter_arrival": events_inter_arrival,
    "pagerank_parts": pagerank_parts,
}

ORACLES = {
    "events_transition_matrix": EVENTS_TRANSITION_SQL,
    "events_inter_arrival": EVENTS_INTER_ARRIVAL_SQL,
    "pagerank_parts": PAGERANK_PARTS_SQL,
}
