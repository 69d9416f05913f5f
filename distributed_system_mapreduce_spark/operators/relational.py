"""Relational/analytic query layer — the declarative queries a user of
the reference would express as multi-round maple/juice chains
(filter-map rounds + key-shuffle reduce rounds; cf. the two-round vote
pipeline in /root/reference/command_backup). Here each is ONE Catalyst
plan: scans with pushed filters + pruned columns, broadcast hash joins
for the dimension tables, partial aggregation before every shuffle.

Exactness discipline: monetary/quantity doubles are cast to DECIMAL
before SUM so aggregation is exact and associative — the same result
regardless of partitioning, and bit-identical to the DuckDB oracle
(the driver value-hashes results; float sums would differ in low bits
across engines). Final outputs are cast back to DOUBLE (a deterministic
correctly-rounded conversion in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


def _dec(col, prec: int = 18, scale: int = 4):
    return F.col(col).cast(f"decimal({prec},{scale})")


# ------------------------------------------------------------------ Q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over lineitem.

    At 100 TB this is the map-side-combine showcase: 8 aggregates
    computed partially per partition, one 6-row shuffle. Only the 7
    referenced columns are read (ReadSchema pruning).
    """
    li = load_table(spark, "lineitem", sf_dir)
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", 9, 4)
    tax = _dec("l_tax", 9, 4)
    qty = _dec("l_quantity")
    disc_price = price * (F.lit(1).cast("decimal(9,4)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(9,4)") + tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("decimal(38,6)").cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("decimal(38,6)").cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("decimal(38,6)").cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DECIMAL(38,6)) AS DOUBLE)
      AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))
      * (CAST(1 AS DECIMAL(9,4)) + CAST(l_tax AS DECIMAL(9,4)))) AS DECIMAL(38,6)) AS DOUBLE)
      AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(9,4))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ Q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> topk.

    customer(BUILDING) is small after the filter -> broadcast into
    orders, then one shuffle join with lineitem on l_orderkey. Top-10
    with a full deterministic tie-break (revenue, date, key).
    """
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(9,4)") - _dec("l_discount", 9, 4))
    ).cast("double")
    return (
        li.join(
            orders.join(F.broadcast(cust),
                        orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE)
      AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------------------ Q5
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, dims broadcast.

    region->nation prune first (broadcast), the customer/orders/
    lineitem chain shuffles on its keys, supplier broadcasts. Catalyst
    + AQE pick broadcast sides; the explicit hints pin the dims.
    """
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(9,4)") - _dec("l_discount", 9, 4))
    ).cast("double")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE)
      AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# ------------------------------------------------------------------ Q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pushdown showcase — every predicate reaches
    the parquet scan (PushedFilters), two columns read, one scalar out."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 9, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ------------------------------------------------------------------ Q10
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue per customer, top 20."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, "nation", sf_dir)
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(9,4)") - _dec("l_discount", 9, 4))
    ).cast("double")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("revenue"),
             F.sum(_dec("c_acctbal")).cast("double").alias("acctbal"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE)
      AS revenue,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acctbal
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------------ order priority (Q4)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join (no row duplication,
    no distinct needed — the Spark-native way to express the
    reference's 'join then dedup' reduce round)."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    big_items = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_quantity") > 45
    )
    return (
        orders.join(big_items,
                    orders.o_orderkey == big_items.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


# ------------------------------------------------------------ top customers
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-rank: top-3 customers by order revenue within each nation.

    One shuffle for the groupBy, one for the window partition; nation
    broadcast. rank() over a (revenue, custkey) tie-broken ordering.
    """
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    totals = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
             F.count("*").alias("n_orders"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        totals.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spend", "n_orders", "rk")
    )


TOP_CUSTOMERS_SQL = """
SELECT n_name, c_custkey, c_name, total_spend, n_orders, rk
FROM (
  SELECT n_name, c_custkey, c_name, total_spend, n_orders,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY total_spend DESC, c_custkey ASC) AS rk
  FROM (
    SELECT n_name, c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_spend,
           COUNT(*) AS n_orders
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    GROUP BY n_name, c_custkey, c_name
  )
)
WHERE rk <= 3
"""


# ------------------------------------------------------------ events family
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily rollup — the batch twin of the streaming windowed
    aggregation in streaming/jobs.py."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.to_date(F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value", 18, 6)).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY CAST(ts AS DATE), event_type
"""


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per event type, z-score each day's
    event count against that type's daily distribution — the pipeline
    health-check that catches an ingest gap or a bot spike.

    Determinism: the moments are EXACT integer aggregates (sum of
    counts, sum of squared counts), so mean/variance come out of pure
    int arithmetic and the only float ops are the final fixed-order
    divisions and a correctly-rounded sqrt — bit-identical in both
    engines, no DECIMAL needed. Two partial-agg shuffles (day rollup,
    type moments) + one broadcast join back; at extreme per-day counts
    (~>3e9) the squared sum needs a DECIMAL accumulator instead of
    BIGINT."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy(F.to_date(F.col("ts")).alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("s").cast("double") / F.col("n_days").cast("double")
    var_num = (F.col("n_days") * F.col("ss")
               - F.col("s") * F.col("s")).cast("double")
    var_den = (F.col("n_days") * (F.col("n_days") - F.lit(1))).cast("double")
    # Degenerate guard: one observed day (var denominator 0) or zero
    # variance would divide by zero — ANSI sessions THROW on that, and
    # CASE branches evaluate lazily on both engines, so the division
    # must live inside the guarded branch.
    ok = (F.col("n_days") > 1) & (var_num > 0)
    z = F.when(
        ok,
        (F.col("n").cast("double") - mean) / F.sqrt(var_num / var_den),
    )
    return j.select(
        "day", "event_type", F.col("n").alias("n_events"),
        z.alias("z"),
        F.when(ok & (F.abs(z) >= 2.0), 1).otherwise(0)
        .cast("long").alias("is_anomaly"),
    )


EVENTS_ANOMALY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS n_days, SUM(n) AS s, SUM(n * n) AS ss
  FROM daily GROUP BY event_type
)
SELECT day, event_type, n AS n_events,
       CASE WHEN n_days > 1 AND n_days * ss - s * s > 0 THEN
         (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
           / sqrt(CAST(n_days * ss - s * s AS DOUBLE)
                  / CAST(n_days * (n_days - 1) AS DOUBLE))
       END AS z,
       CAST(CASE WHEN n_days > 1 AND n_days * ss - s * s > 0 AND abs(
           (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
             / sqrt(CAST(n_days * ss - s * s AS DOUBLE)
                    / CAST(n_days * (n_days - 1) AS DOUBLE))) >= 2.0
         THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM daily JOIN stats USING (event_type)
"""


def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running revenue: ordered window cumulative sum.

    DECIMAL accumulator so the running values are exact (associative)
    — a float running sum would diverge between engines and between
    partitionings of our own job.
    """
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(_dec("value", 18, 6)).over(w).cast("double").alias("running_value"),
    )


EVENTS_RUNNING_SQL = """
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS DECIMAL(18,6)))
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_value
FROM events
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + cumulative session ids,
    then per-user session stats. The batch twin of the stateful
    streaming sessionizer."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Cast via TIMESTAMP: the parquet ts may arrive as TIMESTAMP_NTZ
    # (no direct NTZ->long cast exists); session tz is UTC so the
    # epoch seconds match DuckDB's epoch().
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    with_flag = ev.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    with_sess = with_flag.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id")
        .agg(
            F.max("sess_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


EVENTS_SESSIONIZE_SQL = """
SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                     OR epoch(ts) - epoch(prev_ts) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    )
  )
)
GROUP BY user_id
"""


def events_sessionize_incremental(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Incremental sessionization with boundary stitching — the batch
    twin of the stateful streaming sessionizer's state handoff, and
    the daily-ingest posture at 100 TB: yesterday's run leaves a
    COMPACT per-user state row (session count, event count, last
    event time); today's run windows ONLY today's partition and
    stitches the boundary by seeding each user's first lag with the
    state's last_ts — a session spanning midnight is not double
    counted, a >30-min overnight gap still opens a new one.

    The full-history rescan this avoids is the point: the window
    below runs over the delta partition only, the state side is one
    row per user. Exactness: n_sessions is the count of session
    STARTS, and a start is decided by the gap to the immediately
    preceding event — every gap inside standing or inside delta is
    seen by the respective run, and the single cross-boundary gap is
    seen via the seeded lag, so the sum is bit-identical to a full
    sessionize — which is the oracle (EVENTS_SESSIONIZE_SQL
    verbatim). The cutoff is a fixed date inside the corpus range;
    on a real pipeline it is "yesterday"."""
    ev = load_table(spark, "events", sf_dir)
    boundary = F.lit("2024-01-24 00:00:00").cast("timestamp")
    is_standing = F.col("ts").cast("timestamp") < boundary
    ts_s = F.col("ts").cast("timestamp").cast("long")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    state = (
        ev.where(is_standing)
        .select("user_id", "ts", "event_id", new_sess.alias("new_sess"),
                ts_s.alias("ts_s"))
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("n_sessions"),
             F.count("*").alias("n_events"),
             F.max("ts_s").alias("last_ts"))
    )

    delta = ev.where(~is_standing).join(
        state.select("user_id", "last_ts"), "user_id", "left")
    # seed the first lag with the state's last event time: the one
    # cross-boundary gap the split would otherwise lose
    prev = F.coalesce(F.lag(ts_s).over(w), F.col("last_ts"))
    d_new = F.when(prev.isNull() | (ts_s - prev > 1800), 1).otherwise(0)
    d_agg = (
        delta.select("user_id", d_new.alias("new_sess"))
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("d_sessions"),
             F.count("*").alias("d_events"))
    )
    return (
        state.join(d_agg, "user_id", "full")
        .select(
            "user_id",
            (F.coalesce("n_sessions", F.lit(0))
             + F.coalesce("d_sessions", F.lit(0)))
            .cast("long").alias("n_sessions"),
            (F.coalesce("n_events", F.lit(0))
             + F.coalesce("d_events", F.lit(0)))
            .cast("long").alias("n_events"),
        )
    )


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group; at 100 TB swap COUNT(DISTINCT) for
    approx_count_distinct (HLL) — kept exact here for the oracle."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns of daily counts."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.to_date(F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


EVENTS_PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY CAST(ts AS DATE)
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "order_priority_count": order_priority_count,
    "top_customers": top_customers,
    "events_daily_rollup": events_daily_rollup,
    "events_running_total": events_running_total,
    "events_sessionize": events_sessionize,
    "events_sessionize_incremental": events_sessionize_incremental,
    "distinct_users_by_type": distinct_users_by_type,
    "events_pivot": events_pivot,
    "events_anomaly": events_anomaly,
}

ORACLES = {
    "events_anomaly": EVENTS_ANOMALY_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "order_priority_count": ORDER_PRIORITY_SQL,
    "top_customers": TOP_CUSTOMERS_SQL,
    "events_daily_rollup": EVENTS_DAILY_SQL,
    "events_running_total": EVENTS_RUNNING_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    # the incremental path must be BIT-IDENTICAL to a full sessionize
    "events_sessionize_incremental": EVENTS_SESSIONIZE_SQL,
    "distinct_users_by_type": DISTINCT_USERS_SQL,
    "events_pivot": EVENTS_PIVOT_SQL,
}
