"""Relational wave 9: temporal-signal and cohort-behavior shapes.

- events_autocorr        : lag-1 autocorrelation of the per-type
                           daily volume series — the seasonality /
                           self-similarity diagnostic a forecasting
                           pipeline runs before model choice.
- funnel_latency         : view -> purchase conversion-latency
                           distribution per conversion month.
- customer_repeat_cohort : first-order-month cohorts with repeat
                           rate and order intensity.

Reference parity: SURVEY §2.C "queries they run today" extensions;
the reference would express each as a maple+juice pair over line
files (per-key reduce granularity, /root/reference/maple_juice/
maple_juice.go:376); here they are declarative plans with bounded
aggregates and broadcast self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut


# ------------------------------------------------------ events_autocorr
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily count series:
    Pearson r over (count(day), count(day+1)) pairs for consecutive
    observed days — the "is yesterday predictive of today" signal
    that gates naive-persistence forecasting.

    Shape: one partial-agg shuffle reduces the stream to the BOUNDED
    (type, day) table (days grow with wall time, not data volume);
    the lag pairing is a broadcast self-join on day+1; the moment
    sums per type are a bounded final aggregate. Cross-engine
    exactness: all five moment sums are exact BIGINT integer sums
    (daily counts are integers), the correlation is formed from them
    in ONE fixed-order double expression — num / (sqrt(d1) *
    sqrt(d2)) with IEEE-exact sqrt — so the value hashes identically.
    The BIGINT moments stay well under 2^53 up to ~1e6 events/day/
    type-year; beyond that widen the accumulators to DECIMAL(38,0)
    and split via the DIV/%% idiom (events_twap)."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.date_add(F.col("a.day"), 1) == F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.c").alias("x"), F.col("b.c").alias("y"),
    )
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.when(
            (d1 > 0) & (d2 > 0),
            num.cast("double")
            / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double"))),
        ).alias("acf1"),
    )


EVENTS_AUTOCORR_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
  SELECT a.event_type, a.c AS x, b.c AS y
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day + 1 = b.day
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY event_type
)
SELECT event_type, n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS acf1
FROM m
"""


# ------------------------------------------------------- funnel_latency
def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for each user, time from the
    FIRST 'view' to the first 'purchase' at-or-after it; reported per
    conversion month as count + min/p50/p90/max latency in seconds —
    the funnel-health dashboard row.

    Shape: two partial-agg shuffles on user_id (first view, then
    first qualifying purchase — both map-side-combined mins), then a
    bounded per-month aggregate. Exactness: latencies are integer
    microseconds; the exact percentile's interpolation matches DuckDB
    quantile_cont bit-for-bit (price_quantiles precedent); groups are
    bounded (months), so the per-group exact-percentile sort is safe —
    at unbounded group cardinality swap approx_percentile."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min(us).alias("t_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("t_p"))
        .join(fv, "user_id")
        .filter(F.col("t_p") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t_p").alias("t_purchase"),
             F.min("t_view").alias("t_view"))
    )
    lat = fp.select(
        F.date_trunc("month", F.timestamp_micros(F.col("t_purchase")))
        .cast("date").alias("month"),
        (F.col("t_purchase") - F.col("t_view")).alias("lat_us"),
    )
    return (
        lat.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.min("lat_us").alias("min_us"),
            F.expr("percentile(lat_us, array(0.5, 0.9))").alias("qs"),
            F.max("lat_us").alias("max_us"),
        )
        .select(
            "month", "n_converted", "min_us",
            F.col("qs")[0].alias("p50_us"),
            F.col("qs")[1].alias("p90_us"),
            "max_us",
        )
    )


FUNNEL_LATENCY_SQL = """
WITH fv AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
fp AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase,
         MIN(fv.t_view) AS t_view
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.t_view
  GROUP BY e.user_id
),
lat AS (
  SELECT CAST(date_trunc('month', make_timestamp(t_purchase)) AS DATE)
           AS month,
         t_purchase - t_view AS lat_us
  FROM fp
)
SELECT month, CAST(COUNT(*) AS BIGINT) AS n_converted,
       MIN(lat_us) AS min_us,
       quantile_cont(lat_us, 0.5) AS p50_us,
       quantile_cont(lat_us, 0.9) AS p90_us,
       MAX(lat_us) AS max_us
FROM lat GROUP BY month
"""


# ----------------------------------------------- customer_repeat_cohort
def customer_repeat_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order-month cohort census over orders: cohort size,
    repeat-buyer count and rate, mean orders per customer — the
    retention table every growth dashboard leads with.

    Shape: one partial-agg shuffle on o_custkey reduces orders to a
    per-customer (cohort, n_orders) row; the cohort census is a
    bounded aggregate (months). Integer counts; the two ratios are
    single fixed-order double divisions at output."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.date_trunc("month", F.min("o_orderdate")).cast("date")
            .alias("cohort"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    return (
        per_cust.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum((F.col("n_orders") >= 2).cast("long"))
            .cast("long").alias("n_repeat"),
            F.sum("n_orders").cast("long").alias("total_orders"),
        )
        .select(
            "cohort", "n_customers", "n_repeat", "total_orders",
            (F.col("n_repeat").cast("double")
             / F.col("n_customers").cast("double")).alias("repeat_rate"),
            (F.col("total_orders").cast("double")
             / F.col("n_customers").cast("double"))
            .alias("orders_per_customer"),
        )
    )


CUSTOMER_REPEAT_COHORT_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT cohort,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(SUM(n_orders) AS BIGINT) AS total_orders,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS repeat_rate,
       CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS orders_per_customer
FROM per_cust GROUP BY cohort
"""


# ------------------------------------------------------ nation_share_yoy
def nation_share_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer-nation revenue share of each order year, with the
    year-over-year share delta — the market-mix trend report (q7/q8's
    reporting sibling, but over the whole horizon in one pass).

    Shape: orders shuffle-joins customer on custkey (both fact-sized
    at scale), nation dim broadcast; one partial-agg shuffle to the
    BOUNDED (nation, year) table — localCheckpointed, because the
    year totals, the share projection, and the year-1 lag all
    reference it and would each replay the fact join otherwise (r7
    scan audit: 4 orders+customer scans; now 1); year totals and the
    lag are broadcast self-joins on that bounded table — no window.
    Money sums ride DECIMAL accumulators and cast to DOUBLE once at
    output (q6 discipline); shares and deltas are fixed-order double
    expressions of those casts."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    ny = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
             .alias("rev"))
        .transform(cut)
    )
    ytot = ny.groupBy("yr").agg(F.sum("rev").alias("yrev"))
    cur = (
        ny.join(F.broadcast(ytot), "yr")
        .select(
            "nation", "yr",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") / F.col("yrev").cast("double"))
            .alias("share"),
        )
    )
    prev = cur.select(
        "nation", (F.col("yr") + 1).alias("yr"),
        F.col("share").alias("share_prev"))
    return (
        cur.join(F.broadcast(prev), ["nation", "yr"], "left")
        .select(
            "nation", "yr", "revenue", "share", "share_prev",
            (F.col("share") - F.col("share_prev")).alias("yoy_pp"),
        )
    )


NATION_SHARE_YOY_SQL = """
WITH ny AS (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
         SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, year(o.o_orderdate)
),
ytot AS (SELECT yr, SUM(rev) AS yrev FROM ny GROUP BY yr),
cur AS (
  SELECT nation, ny.yr, CAST(rev AS DOUBLE) AS revenue,
         CAST(rev AS DOUBLE) / CAST(yrev AS DOUBLE) AS share
  FROM ny JOIN ytot ON ny.yr = ytot.yr
)
SELECT a.nation, a.yr, a.revenue, a.share,
       b.share AS share_prev, a.share - b.share AS yoy_pp
FROM cur a LEFT JOIN cur b
  ON a.nation = b.nation AND a.yr = b.yr + 1
"""


# ---------------------------------------------------- user_behavior_gini
def user_behavior_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity census: per user, the Gini impurity of
    their event-type mix, 1 - Σ p_i² — the log-free concentration
    index (entropy's rational twin, so it cross-engine hashes
    exactly) that segments single-action bots from diverse users.

    Shape: two partial-agg shuffles — (user, type) counts, then
    per-user moments; output is one row per user (scales with the
    key, like cdc_apply). Exactness: Σc² and N² are exact BIGINTs;
    the impurity is ONE fixed-order double expression."""
    ev = load_table(spark, "events", sf_dir)
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c"))
    return (
        ut.groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        )
        .select(
            "user_id", "n_events", "n_types",
            (F.lit(1.0)
             - F.col("ss").cast("double")
             / (F.col("n_events").cast("double")
                * F.col("n_events").cast("double"))).alias("gini"),
        )
    )


USER_BEHAVIOR_GINI_SQL = """
WITH ut AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       1.0 - CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
         AS gini
FROM ut GROUP BY user_id
"""


QUERIES = {
    "events_autocorr": events_autocorr,
    "funnel_latency": funnel_latency,
    "customer_repeat_cohort": customer_repeat_cohort,
    "nation_share_yoy": nation_share_yoy,
    "user_behavior_gini": user_behavior_gini,
}

ORACLES = {
    "events_autocorr": EVENTS_AUTOCORR_SQL,
    "funnel_latency": FUNNEL_LATENCY_SQL,
    "customer_repeat_cohort": CUSTOMER_REPEAT_COHORT_SQL,
    "nation_share_yoy": NATION_SHARE_YOY_SQL,
    "user_behavior_gini": USER_BEHAVIOR_GINI_SQL,
}
