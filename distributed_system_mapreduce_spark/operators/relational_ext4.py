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
from distributed_system_mapreduce_spark.lineage import cut


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
    in orders); each round is one BROADCAST-hash join (the node-sized
    rank table onto the checkpointed edge table — the EDGES never
    shuffle after the build) + one partial-agg shuffle (map-side
    combined sum by dst, node-sized output). The r4 plan let Catalyst
    pick the build side and it broadcast the 2.4M-row EDGE table 3x
    (ExistingRDD stats are a guess) and re-derived the node count per
    round through a crossJoin subtree — explicit F.broadcast(ranks)
    and one collected node-count scalar (bounded driver state: ONE
    int, same class as the year-offset stitches) fixed both; measured
    9.2s -> ~3.5s warm at sf0.1. Degrees ride the checkpointed edge
    table. Rounds are unrolled into one plan off that single
    materialized table (built once, read 3x).

    The reference would run this as 3 chained maple/juice rounds over
    SDFS intermediates (/root/reference/maple_juice/maple_juice.go:241
    exe contract); here the "intermediates" are Catalyst exchanges.
    """
    from distributed_system_mapreduce_spark.functions.graphs import (
        strong_edges,
    )

    li = load_table(spark, "lineitem", sf_dir)
    # support 1 = every co-purchase pair, both directions (the
    # in-array pair expansion replaces the order-key self-join —
    # functions/graphs.py, measured ~2.8x on the edge build)
    edges = strong_edges(li, 1)
    # fold the degree in via a src-partitioned window (one shuffle, no
    # join) and checkpoint ONCE: each round then needs one broadcast
    # join + one partial agg against this single materialized table
    edeg = edges.withColumn(
        "deg", F.count("*").over(Window.partitionBy("src"))
    ).transform(cut)
    # every node appears as src (the edge list is symmetric by
    # construction), so the src set is the node list; its COUNT is one
    # bounded scalar — inline it as a literal so no round re-derives it
    nodes = edeg.select("src").distinct()
    n = nodes.count()
    ranks = nodes.select(
        F.col("src").alias("part"),
        F.lit(_PR_SCALE // n if n else 0).cast("long").alias("rank"),
    )
    base = _PR_SCALE * 15 // (100 * n) if n else 0
    for _ in range(_PR_ROUNDS):
        incoming = (
            edeg.join(F.broadcast(ranks), edeg["src"] == ranks["part"])
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div deg")).cast("long").alias("s"))
        )
        ranks = incoming.select(
            F.col("dst").alias("part"),
            F.expr(f"CAST({base} AS BIGINT) + (85 * s) div 100")
            .alias("rank"),
        )
    return ranks.orderBy(F.desc("rank"), "part").limit(20).select(
        F.col("part").alias("l_partkey"), "rank")


def _pr_round_sql(prev: str) -> str:
    return (
        # CAST the whole round expression: SUM(BIGINT) widens to HUGEINT
        # in DuckDB and would otherwise leak a HUGEINT output column that
        # the driver's normalizer floats before hashing.
        f"SELECT e.dst AS part, "
        f"CAST(CAST({_PR_SCALE * 15} AS BIGINT) // (100 * n.n) "
        f"+ (85 * SUM(r.rank // d.deg)) // 100 AS BIGINT) AS rank "
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


# strong-tie threshold: parts must be co-ordered in >= 2 distinct
# orders for an edge — random single co-occurrences are noise, and the
# support filter is also what keeps wedge fan-out (sum of deg^2) sane.
_TRI_SUPPORT = 2


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census over the STRONG co-purchase graph
    (edges = part pairs co-ordered in >= _TRI_SUPPORT distinct orders):
    nodes, edges, and closed triangles — the classic clustering
    measure (and the classic MapReduce benchmark, which the reference
    would run as two maple/juice rounds over an edge file).

    Shape: edges are canonical u < v, so each triangle is counted
    exactly once as u < v < w — two equi-join shuffles (wedge build on
    the shared middle node, then closure probe), one scalar agg. Wedge
    fan-out is sum(deg^2) over the support-filtered graph; if a
    hub survives the support filter at scale, the standard upgrade is
    degree-orientation (direct each edge low->high degree, bounding
    out-degree by sqrt(2m)) — same join plan, different edge
    direction rule.
    """
    from distributed_system_mapreduce_spark.functions.graphs import (
        strong_undirected,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = (
        strong_undirected(li, _TRI_SUPPORT)
        .select("u", "v")
        .transform(cut)
    )
    ab, bc, ac = edges.alias("ab"), edges.alias("bc"), edges.alias("ac")
    wedges = ab.join(bc, F.col("ab.v") == F.col("bc.u"))
    tris = wedges.join(
        ac, (F.col("ab.u") == F.col("ac.u"))
        & (F.col("bc.v") == F.col("ac.v")))
    nodes = edges.select(F.col("u").alias("x")).union(
        edges.select("v")).distinct()
    return (
        F.broadcast(nodes.agg(F.count("*").alias("n_nodes")))
        .crossJoin(F.broadcast(edges.agg(F.count("*").alias("n_edges"))))
        .crossJoin(F.broadcast(tris.agg(F.count("*").alias("n_triangles"))))
    )


TRIANGLE_COUNT_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_TRI_SUPPORT}
)
SELECT
  (SELECT COUNT(*) FROM (
     SELECT u AS x FROM edges UNION SELECT v FROM edges)) AS n_nodes,
  (SELECT COUNT(*) FROM edges) AS n_edges,
  (SELECT COUNT(*) FROM edges ab
     JOIN edges bc ON ab.v = bc.u
     JOIN edges ac ON ab.u = ac.u AND bc.v = ac.v) AS n_triangles
"""


# orders columns profiled; min/max compare as strings (identical
# byte-wise semantics in both engines) so one schema fits every type
_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
)


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table: per column, null
    count, exact distinct count, and lexicographic min/max — the
    "dataset card" / ingest-sanity scan every pipeline runs first.

    Shape: one narrow scan PER COLUMN, unioned. On columnar storage
    this reads exactly the same bytes as a single wide pass (each scan
    prunes to its one column — verified: each union branch's parquet
    ReadSchema is a single field), each branch's single distinct is a
    plain two-phase partial agg, and the multi-distinct Expand plan
    (which replicates every row #cols+1 times through the aggregate)
    never appears — measured 3x faster at sf0.1. The branches are
    independent jobs Spark runs from one action. At extreme widths
    swap the exact distincts for approx_count_distinct to cut the
    per-branch shuffle to a constant sketch.
    """
    from functools import reduce

    o = load_table(spark, "orders", sf_dir)
    parts = []
    for c in _PROFILE_COLS:
        s = F.col(c).cast("string")
        parts.append(
            o.select(F.col(c)).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(s)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(s).alias("min_value"),
                F.max(s).alias("max_value"),
            )
        )
    return reduce(lambda x, y: x.unionByName(y), parts)


_PROFILE_ROWS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, _n AS n_rows, {c}_nulls AS n_nulls,
       {c}_dist AS n_distinct, {c}_min AS min_value, {c}_max AS max_value
       FROM one"""
    for c in _PROFILE_COLS
)

PROFILE_ORDERS_SQL = f"""
WITH one AS (
  SELECT COUNT(*) AS _n,
         {", ".join(
    f"COUNT(*) - COUNT(CAST({c} AS VARCHAR)) AS {c}_nulls, "
    f"COUNT(DISTINCT {c}) AS {c}_dist, "
    f"MIN(CAST({c} AS VARCHAR)) AS {c}_min, "
    f"MAX(CAST({c} AS VARCHAR)) AS {c}_max"
    for c in _PROFILE_COLS)}
  FROM orders
)
{_PROFILE_ROWS_SQL}
"""


def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type: open/high/low/close of `value`
    plus count and volume — the time-series candle rollup.

    Open/close are picked by row_number windows partitioned by
    (day, type) with a full (ts, event_id) tie-break — deterministic
    in both engines, unlike first()/arg_min on a timestamp alone when
    timestamps tie. min/max/count are plain partial aggs; volume goes
    through a DECIMAL accumulator, DOUBLE at output.
    """
    ev = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "event_type", "ts", "event_id",
        "value")
    wo = Window.partitionBy("day", "event_type").orderBy(
        "ts", "event_id")
    wc = Window.partitionBy("day", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id"))
    marked = ev.select(
        "day", "event_type", "value",
        F.row_number().over(wo).alias("rn_o"),
        F.row_number().over(wc).alias("rn_c"),
    )
    return marked.groupBy("day", "event_type").agg(
        F.max(F.when(F.col("rn_o") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_c") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double").alias("volume"),
    )


EVENTS_OHLC_SQL = """
WITH marked AS (
  SELECT CAST(ts AS DATE) AS day, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE), event_type
                            ORDER BY ts, event_id) AS rn_o,
         ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE), event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_c
  FROM events
)
SELECT day, event_type,
       MAX(CASE WHEN rn_o = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_c = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
FROM marked
GROUP BY day, event_type
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill a sparse measure: the JSON ``$.k`` prop is only
    present on some events; carry the user's last observed value
    forward onto every event (sensor/state gap-fill). Output is
    per-event, summarized per (type, has-fill) for a bounded result:
    the full-width filled stream is the intermediate.

    last(ignorenulls) over a user-partitioned running frame — the
    canonical carry-forward; never a global window.
    """
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.select(
        "event_type",
        k.alias("k"),
        F.last(k, ignorenulls=True).over(w).alias("k_filled"),
    )
    return filled.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("k").alias("n_observed"),
        F.count("k_filled").alias("n_filled"),
        F.sum("k_filled").cast("long").alias("sum_filled"),
    )


EVENTS_GAP_FILL_SQL = """
WITH filled AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         LAST_VALUE(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS k_filled
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(k) AS n_observed,
       COUNT(k_filled) AS n_filled,
       CAST(SUM(k_filled) AS BIGINT) AS sum_filled
FROM filled
GROUP BY event_type
"""


def orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog timeline: per day, orders opened, orders
    fulfilled (last line shipped), and the running count of still-open
    orders — the interval-to-timeline shape behind every WIP/queue
    dashboard.

    The running sum is EXACT and global yet never computed in a
    global window (single-partition sort = non-viable at scale): daily
    deltas aggregate first (calendar-bounded rows), then per-YEAR
    totals — O(#years) scalars — stitch year-partitioned cumsum
    windows into the global prefix sum, the same distributed
    prefix-sum discipline as range_partition_hist.
    """
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    opens = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_opened"))
    fulf = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("day"))
        .groupBy("day").agg(F.count("*").alias("n_fulfilled"))
    )
    days = (
        opens.join(fulf, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
            F.coalesce("n_fulfilled", F.lit(0)).alias("n_fulfilled"),
        )
        .withColumn("yr", F.year("day"))
        .withColumn("delta", F.col("n_opened") - F.col("n_fulfilled"))
    )
    ytot = {
        r["yr"]: r["t"]
        for r in days.groupBy("yr").agg(
            F.sum("delta").alias("t")).collect()
    }
    offs, run = [], 0
    for yr in sorted(ytot):
        offs.append((yr, run))
        run += ytot[yr]
    off_df = spark.createDataFrame(offs or [(0, 0)], "yr int, off long")
    w = (
        Window.partitionBy("yr").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(F.broadcast(off_df), "yr")
        .select(
            "day", "n_opened", "n_fulfilled",
            (F.sum("delta").over(w) + F.col("off")).alias("backlog"),
        )
    )


ORDERS_BACKLOG_SQL = """
WITH opens AS (
  SELECT o_orderdate AS day, COUNT(*) AS n_opened FROM orders GROUP BY 1
),
fulf AS (
  SELECT day, COUNT(*) AS n_fulfilled
  FROM (SELECT l_orderkey, MAX(l_shipdate) AS day
        FROM lineitem GROUP BY 1)
  GROUP BY day
),
days AS (
  SELECT COALESCE(o.day, f.day) AS day,
         COALESCE(n_opened, 0) AS n_opened,
         COALESCE(n_fulfilled, 0) AS n_fulfilled
  FROM opens o FULL JOIN fulf f ON o.day = f.day
)
SELECT day, n_opened, n_fulfilled,
       CAST(SUM(n_opened - n_fulfilled)
              OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS backlog
FROM days
"""


def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern: distinct (user, day) pairs, island id =
    day minus row_number (constant within a consecutive run), then
    per-island lengths rolled up per user.

    Every window is user-partitioned; the distinct reduces the stream
    to at most users x days rows before any window sort. Output is
    exact integers only.
    """
    ev = load_table(spark, "events", sf_dir)
    pairs = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = pairs.select(
        "user_id", "day",
        F.date_sub("day", F.row_number().over(w)).alias("island"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak"))
    return per_island.groupBy("user_id").agg(
        F.sum("streak").cast("long").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("streak").alias("max_streak"),
    )


EVENTS_STREAKS_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER
           (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
  FROM pairs
),
per_island AS (
  SELECT user_id, island, COUNT(*) AS streak
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(streak) AS BIGINT) AS n_active_days,
       COUNT(*) AS n_streaks,
       MAX(streak) AS max_streak
FROM per_island
GROUP BY user_id
"""


def supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier fulfillment latency: days between order date and
    each line's ship date — supply-chain SLA profiling.

    One fact-fact equi-join shuffle on orderkey (AQE handles skew),
    integer day arithmetic, one partial-agg shuffle per supplier; the
    mean is a single division of exact ints.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_suppkey",
        F.datediff("l_shipdate", "o_orderdate").alias("lead_days"))
    n = F.count("*")
    return j.groupBy("l_suppkey").agg(
        n.alias("n_lines"),
        F.min("lead_days").alias("min_lead"),
        F.max("lead_days").alias("max_lead"),
        F.sum("lead_days").cast("long").alias("sum_lead"),
        (F.sum("lead_days").cast("double") / n.cast("double"))
        .alias("avg_lead"),
    )


SUPPLIER_LEAD_TIME_SQL = """
SELECT l_suppkey,
       COUNT(*) AS n_lines,
       MIN(lead_days) AS min_lead,
       MAX(lead_days) AS max_lead,
       CAST(SUM(lead_days) AS BIGINT) AS sum_lead,
       CAST(SUM(lead_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_lead
FROM (
  SELECT l_suppkey,
         date_diff('day', o_orderdate, l_shipdate) AS lead_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY l_suppkey
"""


QUERIES = {
    "events_transition_matrix": events_transition_matrix,
    "events_inter_arrival": events_inter_arrival,
    "pagerank_parts": pagerank_parts,
    "triangle_count": triangle_count,
    "profile_orders": profile_orders,
    "events_ohlc": events_ohlc,
    "events_gap_fill": events_gap_fill,
    "orders_backlog": orders_backlog,
    "events_streaks": events_streaks,
    "supplier_lead_time": supplier_lead_time,
}

ORACLES = {
    "orders_backlog": ORDERS_BACKLOG_SQL,
    "events_streaks": EVENTS_STREAKS_SQL,
    "supplier_lead_time": SUPPLIER_LEAD_TIME_SQL,
    "events_transition_matrix": EVENTS_TRANSITION_SQL,
    "events_inter_arrival": EVENTS_INTER_ARRIVAL_SQL,
    "pagerank_parts": PAGERANK_PARTS_SQL,
    "triangle_count": TRIANGLE_COUNT_SQL,
    "profile_orders": PROFILE_ORDERS_SQL,
    "events_ohlc": EVENTS_OHLC_SQL,
    "events_gap_fill": EVENTS_GAP_FILL_SQL,
}
