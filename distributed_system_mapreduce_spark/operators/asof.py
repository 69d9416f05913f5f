"""As-of (point-in-time) join — the canonical custom operator Spark
has no built-in for, composed from native ops the scale-correct way.

events_asof_order: each event gets the user's most recent order at or
before the event time. Implementation is the union + keyed-window
pattern, NOT a range self-join:

  1. pre-dedupe the order side to one row per (user, time) with a
     deterministic winner (max orderkey) — makes tie behavior exact;
  2. union both sides into one (user_id, t) stream, orders sorted
     before events at equal t (an order placed at the event instant
     counts);
  3. one window partitioned by user_id ordered by (t, side):
     last(order_cols, ignorenulls) over rows UNBOUNDED PRECEDING..
     CURRENT ROW carries the latest order forward;
  4. keep the event rows.

Cost: ONE shuffle of events+orders by user_id and an in-partition
sort — linear at 100 TB. The naive inequality join
(e.user = o.user AND o.t <= e.t with a per-event argmax) explodes to
|events| x |orders-per-user| intermediate rows; this never does.

The DuckDB oracle uses its native ASOF LEFT JOIN against the same
deduped order side — two completely independent formulations that
must hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


def events_asof_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir)

    # one order per (custkey, orderdate): max orderkey wins (and its
    # totalprice rides along in the struct max)
    o = (
        orders.groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"))
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("o"))
        .select("user_id", "t",
                F.col("o.o_orderkey").alias("last_orderkey"),
                F.col("o.o_totalprice").alias("last_total"))
        .withColumn("is_order", F.lit(1))
        .withColumn("event_id", F.lit(None).cast("long"))
    )
    e = ev.select(
        "user_id", F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("last_orderkey"),
        F.lit(None).cast("double").alias("last_total"),
        F.lit(0).alias("is_order"), "event_id",
    )
    unioned = o.select(*e.columns).unionByName(e)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "user_id", "t", "is_order", "event_id",
        F.last("last_orderkey", ignorenulls=True).over(w)
        .alias("last_orderkey"),
        F.last("last_total", ignorenulls=True).over(w).alias("last_total"),
    )
    return (
        carried.filter(F.col("is_order") == 0)
        .select("event_id", "user_id", F.col("t").alias("ts"),
                "last_orderkey", "last_total")
    )


EVENTS_ASOF_ORDER_SQL = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate AS t,
         MAX(o_orderkey) AS last_orderkey,
         arg_max(o_totalprice, o_orderkey) AS last_total
  FROM orders
  GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts,
       o.last_orderkey, o.last_total
FROM events e
ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts >= o.t
"""


ATTR_HOURS = 24
_BIN_S = ATTR_HOURS * 3600


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketized: per purchase event, count the same
    user's view/click touches in the preceding 24 hours — the
    conversion-funnel attribution query.

    Spark plans a raw inequality join as BroadcastNestedLoop /
    cartesian — quadratic per user. The scale-correct form bins both
    sides into window-sized buckets: a purchase's lookback spans at
    most two bins, so the purchase side explodes into two
    (user, bin) probes, the join is a plain HASH equi-join on
    (user_id, bin), and the exact range predicate filters after.
    Join fan-in per key is bounded by events-per-user-per-two-days,
    never the user's whole history."""
    ev = load_table(spark, "events", sf_dir)
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select("user_id", F.col("ts").alias("touch_ts"))
        .withColumn(
            "bin", F.floor(F.unix_timestamp("touch_ts") / F.lit(_BIN_S)))
    )
    pbin = F.floor(F.unix_timestamp("ts") / F.lit(_BIN_S))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withColumn("bin", F.explode(F.array(pbin - 1, pbin)))
    )
    # explicit aliases: both sides derive from the same scan, so bare
    # column refs would be self-referential (Spark resolves them by
    # heuristic and warns "trivially true equals predicate")
    purchases = purchases.alias("p")
    touches = touches.alias("t")
    return (
        purchases.join(
            touches,
            (F.col("p.user_id") == F.col("t.user_id"))
            & (F.col("p.bin") == F.col("t.bin")))
        .filter(
            (F.col("touch_ts") < F.col("ts"))
            & (F.col("touch_ts") >= F.col("ts")
               - F.expr(f"INTERVAL {ATTR_HOURS} HOURS")))
        .groupBy("event_id")
        .agg(F.count("*").alias("n_prior_touches"))
    )


PURCHASE_ATTRIBUTION_SQL = f"""
SELECT p.event_id, COUNT(*) AS n_prior_touches
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts AS touch_ts FROM events
      WHERE event_type IN ('view', 'click')) t
  ON t.user_id = p.user_id
 AND t.touch_ts < p.ts
 AND t.touch_ts >= p.ts - INTERVAL {ATTR_HOURS} HOUR
GROUP BY p.event_id
"""


def abandoned_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ANTI join: per day, how many view events were NOT
    followed by a purchase from the same user within the next
    {h} hours — the abandonment funnel (purchase_attribution's
    forward-looking complement).

    Same bucketization discipline: a view's forward window spans at
    most two {h}-hour bins, so the view side explodes into two
    (user, bin) probes, the candidate join is a plain hash equi-join,
    the exact range predicate filters after, and the anti set is a
    distinct + left join — never a nested-loop inequality join. The
    rate is one division of exact ints.
    """.format(h=ATTR_HOURS)
    ev = load_table(spark, "events", sf_dir)
    vbin = F.floor(F.unix_timestamp("ts") / F.lit(_BIN_S))
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts")
        .withColumn("bin", F.explode(F.array(vbin, vbin + 1)))
        .alias("v")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withColumn(
            "bin", F.floor(F.unix_timestamp("p_ts") / F.lit(_BIN_S)))
        .alias("p")
    )
    converted = (
        views.join(
            purchases,
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("v.bin") == F.col("p.bin")))
        .filter(
            (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts")
               + F.expr(f"INTERVAL {ATTR_HOURS} HOURS")))
        .select(F.col("v.event_id").alias("event_id"))
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    base = (
        ev.filter(F.col("event_type") == "view")
        .select("event_id", F.to_date("ts").alias("day"))
    )
    n = F.count("*")
    nc = F.sum(F.coalesce("conv", F.lit(0)))
    return (
        base.join(converted, "event_id", "left")
        .groupBy("day")
        .agg(
            n.alias("n_views"),
            nc.cast("long").alias("n_converted"),
            (n - nc).cast("long").alias("n_abandoned"),
            ((n - nc).cast("double") / n.cast("double"))
            .alias("abandonment_rate"),
        )
    )


ABANDONED_VIEWS_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, ts, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'view'
),
conv AS (
  SELECT DISTINCT v.event_id
  FROM v JOIN events p
    ON p.event_type = 'purchase'
   AND p.user_id = v.user_id
   AND p.ts > v.ts
   AND p.ts <= v.ts + INTERVAL {ATTR_HOURS} HOUR
)
SELECT day,
       COUNT(*) AS n_views,
       CAST(SUM(CASE WHEN c.event_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_abandoned,
       CAST(SUM(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS abandonment_rate
FROM v LEFT JOIN conv c ON v.event_id = c.event_id
GROUP BY day
"""


# ----------------------------------------------------- attribution_credit
def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based multi-touch attribution: each purchase's credit
    is split across its prior-24h view/click touches U-shaped — 40%
    to the first touch, 40% to the last, 20% spread over the middle
    (100% to a lone touch, 50/50 for two) — then rolled up per touch
    type. The marketing-mix question last-touch counting
    (purchase_attribution) cannot answer.

    Shape: the same bucketized range join as purchase_attribution
    (purchases explode into two window-sized bins, hash equi-join,
    exact predicate after — never an inequality join); per-purchase
    touch ORDER comes from a window partitioned by the purchase id
    (bounded by touches-per-user-per-day). Cross-engine exactness:
    each touch's credit is one or two exact-rational double ops,
    grid-scaled to integer nanocredits (floor(c*1e9 + 0.5)) so the
    per-type SUM is an exact BIGINT; one double division at
    output."""
    ev = load_table(spark, "events", sf_dir)
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select(F.col("event_id").alias("touch_id"),
                "user_id", F.col("event_type").alias("touch_type"),
                F.col("ts").alias("touch_ts"))
        .withColumn(
            "bin", F.floor(F.unix_timestamp("touch_ts") / F.lit(_BIN_S)))
    )
    pbin = F.floor(F.unix_timestamp("ts") / F.lit(_BIN_S))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withColumn("bin", F.explode(F.array(pbin - 1, pbin)))
    )
    p, t = purchases.alias("p"), touches.alias("t")
    matched = (
        p.join(t, (F.col("p.user_id") == F.col("t.user_id"))
               & (F.col("p.bin") == F.col("t.bin")))
        .filter(
            (F.col("touch_ts") < F.col("ts"))
            & (F.col("touch_ts") >= F.col("ts")
               - F.expr(f"INTERVAL {ATTR_HOURS} HOURS")))
        .select("event_id", "touch_id", "touch_type", "touch_ts")
    )
    w = Window.partitionBy("event_id").orderBy("touch_ts", "touch_id")
    ranked = matched.select(
        "event_id", "touch_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_id")).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")),
              F.when(F.col("n") == 2, F.lit(0.5)).otherwise(F.lit(0.4)))
        .otherwise(F.lit(0.2) / (F.col("n") - 2).cast("double"))
    )
    return (
        ranked.select(
            "touch_type",
            F.floor(credit * F.lit(1000000000.0) + F.lit(0.5))
            .cast("long").alias("c9"),
        )
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_touches"),
             F.sum("c9").cast("long").alias("c9_sum"))
        .select(
            "touch_type", "n_touches",
            (F.col("c9_sum").cast("double") / F.lit(1e9))
            .alias("credit"),
        )
    )


ATTRIBUTION_CREDIT_SQL = f"""
WITH matched AS (
  SELECT p.event_id, t.event_id AS touch_id,
         t.event_type AS touch_type, t.ts AS touch_ts
  FROM (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase') p
  JOIN (SELECT event_id, user_id, event_type, ts FROM events
        WHERE event_type IN ('view', 'click')) t
    ON t.user_id = p.user_id
   AND t.ts < p.ts
   AND t.ts >= p.ts - INTERVAL {ATTR_HOURS} HOURS
),
ranked AS (
  SELECT touch_type,
         ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY touch_ts, touch_id) AS pos,
         COUNT(*) OVER (PARTITION BY event_id) AS n
  FROM matched
),
credited AS (
  SELECT touch_type,
         CAST(floor((CASE
            WHEN n = 1 THEN 1.0
            WHEN pos = 1 OR pos = n THEN
              CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END
            ELSE 0.2 / CAST(n - 2 AS DOUBLE)
         END) * 1000000000.0 + 0.5) AS BIGINT) AS c9
  FROM ranked
)
SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(CAST(SUM(c9) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS credit
FROM credited
GROUP BY touch_type
"""


# --------------------------------------------------- scd2_rate_join
# SCD-2 (slowly-changing-dimension type 2) as-of join: every order is
# priced under the nation "rate" version valid AT ITS ORDER DATE. The
# version table is synthesized deterministically (both engines build
# the identical table, so the oracle is independent end-to-end):
# for nation k and month index m (months since _SCD2_BASE, covering
# the order date range), a version exists at m = 0 (every nation
# rated from day one) and at every m where (k + m) % 5 == 0 — sparse
# IRREGULAR validity windows, so the match is a true as-of, not a
# month equi-join. rate_cents = (k*7 + m*3) % 10 + 5 (integer cents,
# exact in both engines).
_SCD2_BASE = "1995-01-01"
_SCD2_MONTHS = 80  # covers o_orderdate 1995-01 .. 2001-08


def scd2_rate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced under their as-of dimension version, rolled up
    per nation: (nation, n_orders, taxed_revenue) where taxed_revenue
    = SUM(o_totalprice * rate) under the version valid at
    o_orderdate.

    Scale shape: the as-of is BUCKETIZED — the sparse version table
    (O(nations x months), driver-free) is fill-forwarded onto the
    dense month grid with one tiny window, and the fact side then
    equi-joins on (nationkey, month) against the broadcast grid: one
    hash join probe per order, no range join, no fact-side window.
    The DuckDB oracle is the independent formulation — a native ASOF
    JOIN against the SPARSE version table. Exactness: integer
    rate_cents times DECIMAL(18,2) totalprice, one DOUBLE cast at
    output."""
    nations = F.broadcast(load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").cast("int").alias("nationkey"), "n_name"))
    grid = (
        spark.range(25).select(F.col("id").cast("int").alias("nationkey"))
        .crossJoin(spark.range(_SCD2_MONTHS)
                   .select(F.col("id").cast("int").alias("m")))
    )
    rate = ((F.col("nationkey") * 7 + F.col("m") * 3) % 10 + 5) \
        .cast("int")
    versions = grid.where(
        (F.col("m") == 0) | ((F.col("nationkey") + F.col("m")) % 5 == 0)
    ).select("nationkey", "m", rate.alias("rate_cents"))
    # fill-forward the sparse versions onto the dense month grid
    # (O(nations x months) rows — a broadcastable dimension)
    w = (
        Window.partitionBy("nationkey").orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.broadcast(
        grid.join(versions, ["nationkey", "m"], "left")
        .select("nationkey", "m",
                F.last("rate_cents", ignorenulls=True).over(w)
                .alias("rate_cents"))
    )
    # fact-side month index, CLAMPED to the grid top: an order dated
    # past the last grid month must still price under the latest
    # version (exactly what the oracle's unbounded ASOF gives, since
    # no version exists above the grid) instead of silently dropping
    # out of the equi-join. Pre-grid orders (m < 0) match nothing in
    # BOTH engines (no version is valid before m = 0) — consistent.
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_totalprice",
        F.least(
            ((F.year("o_orderdate") - 1995) * 12
             + F.month("o_orderdate") - 1).cast("int"),
            F.lit(_SCD2_MONTHS - 1),
        ).alias("m"),
    )
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").cast("int").alias("nationkey"))
    return (
        orders.join(cust, "o_custkey")
        .join(filled, ["nationkey", "m"])
        .join(nations, "nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")
                   * F.col("rate_cents")).cast("double") / 100.0)
            .alias("taxed_revenue"),
        )
    )


SCD2_RATE_JOIN_SQL = f"""
WITH grid AS (
  SELECT n.n_nationkey AS nationkey, g.m
  FROM nation n,
       (SELECT UNNEST(range({_SCD2_MONTHS})) AS m) g
),
versions AS (
  SELECT nationkey, m,
         (nationkey * 7 + m * 3) % 10 + 5 AS rate_cents
  FROM grid
  WHERE m = 0 OR (nationkey + m) % 5 = 0
),
o AS (
  SELECT c.c_nationkey AS nationkey,
         (year(o.o_orderdate) - 1995) * 12
           + month(o.o_orderdate) - 1 AS m,
         o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * v.rate_cents)
            AS DOUBLE) / 100.0 AS taxed_revenue
FROM o
ASOF JOIN versions v
  ON o.nationkey = v.nationkey AND o.m >= v.m
JOIN nation n ON n.n_nationkey = o.nationkey
GROUP BY n.n_name
"""


QUERIES = {
    "events_asof_order": events_asof_order,
    "scd2_rate_join": scd2_rate_join,
    "purchase_attribution": purchase_attribution,
    "abandoned_views": abandoned_views,
    "attribution_credit": attribution_credit,
}

ORACLES = {
    "events_asof_order": EVENTS_ASOF_ORDER_SQL,
    "scd2_rate_join": SCD2_RATE_JOIN_SQL,
    "purchase_attribution": PURCHASE_ATTRIBUTION_SQL,
    "abandoned_views": ABANDONED_VIEWS_SQL,
    "attribution_credit": ATTRIBUTION_CREDIT_SQL,
}
