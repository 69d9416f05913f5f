"""Relational wave 14: change detection and elasticity regression.

- events_cusum           : CUSUM change-point detection over each
                           type's daily volume — the sequential
                           drift alarm that catches slow shifts
                           z-score monitors miss.
- discount_qty_elasticity: per-part OLS slope of quantity on
                           discount — does discounting move volume?
                           The first-order elasticity read every
                           pricing team asks for.

Reference parity: SURVEY §2.C extensions (maple+juice pairs in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


# --------------------------------------------------------- events_cusum
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM on daily event volume per type: S_0 = 0,
    S_t = max(0, S_{t-1} + (x_t - mean)), reporting the peak
    statistic and the day it peaks (ties to the earliest day) — the
    classic sequential change detector for "volume drifted upward
    somewhere in this window".

    Exactness: x_t and the global mean are exact integers/rationals —
    the recurrence runs on values scaled by n_days (S'_t = max(0,
    S'_{t-1} + n·x_t - total)) so every term is an exact BIGINT and
    NO floating point enters the fold at all; the peak is integer
    max, divided back to events/day once at output. The fold is a
    strict left fold over the day-sorted array (the user_survival_km
    discipline); state per type is one bounded array. Shape: one
    partial-agg shuffle to the bounded (type, day) grid, one bounded
    per-type fold."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("x").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_days"))
    # scaled recurrence in exact integers: acc = (S'_{t-1}, best, argday)
    fold = (
        "aggregate(array_sort(arr), "
        "named_struct('s', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT),"
        " 'at', CAST(NULL AS DATE)), "
        "(acc, e) -> named_struct("
        "  's', greatest(CAST(0 AS BIGINT), acc.s + e.term),"
        "  'best', CASE WHEN greatest(CAST(0 AS BIGINT),"
        "       acc.s + e.term) > acc.best"
        "       THEN greatest(CAST(0 AS BIGINT), acc.s + e.term)"
        "       ELSE acc.best END,"
        "  'at', CASE WHEN greatest(CAST(0 AS BIGINT),"
        "       acc.s + e.term) > acc.best"
        "       THEN e.day ELSE acc.at END))"
    )
    return (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", "n_days", "day",
            (F.col("n_days") * F.col("x") - F.col("total"))
            .cast("long").alias("term"),
        )
        .groupBy("event_type", "n_days")
        .agg(F.expr("collect_list(struct(day, term))").alias("arr"))
        .select("event_type", "n_days", F.expr(fold).alias("r"))
        .select(
            "event_type", "n_days",
            F.col("r.best").alias("peak_scaled"),
            (F.col("r.best").cast("double")
             / F.col("n_days").cast("double")).alias("peak_cusum"),
            F.col("r.at").alias("peak_day"),
        )
    )


EVENTS_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
),
terms AS (
  SELECT d.event_type, tot.n_days, d.day,
         CAST(tot.n_days * d.x - tot.total AS BIGINT) AS term
  FROM daily d JOIN tot ON d.event_type = tot.event_type
),
folded AS (
  -- DuckDB lambda-struct quirk: fields of the result struct are
  -- computed IN ORDER and later fields see the accumulator already
  -- updated (sequential mutation), unlike Spark's snapshot
  -- semantics. Order the fields so each reads only not-yet-updated
  -- accumulator fields: 'at' (reads s, best, at), then 'best'
  -- (reads s, best), then 's' (reads s) — correct under BOTH
  -- semantics.
  SELECT event_type, MIN(n_days) AS n_days,
         list_reduce(
           list_prepend(
             {'at': CAST(NULL AS DATE), 'best': CAST(0 AS BIGINT),
              's': CAST(0 AS BIGINT)},
             list({'at': day, 'best': CAST(0 AS BIGINT), 's': term}
                  ORDER BY day)),
           (acc, e) -> {
             'at': CASE WHEN greatest(CAST(0 AS BIGINT), acc.s + e.s)
                        > acc.best
                   THEN e.at ELSE acc.at END,
             'best': CASE WHEN greatest(CAST(0 AS BIGINT), acc.s + e.s)
                          > acc.best
                     THEN greatest(CAST(0 AS BIGINT), acc.s + e.s)
                     ELSE acc.best END,
             's': greatest(CAST(0 AS BIGINT), acc.s + e.s)}) AS r
  FROM terms
  GROUP BY event_type
)
SELECT event_type, n_days,
       r.best AS peak_scaled,
       CAST(r.best AS DOUBLE) / CAST(n_days AS DOUBLE) AS peak_cusum,
       r.at AS peak_day
FROM folded
"""


# ------------------------------------------------ discount_qty_elasticity
ELASTICITY_MIN_N = 5


def discount_qty_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part OLS slope of quantity on discount: does a deeper
    discount actually move more units of this part? Parts with at
    least ELASTICITY_MIN_N order lines and non-degenerate discount
    variation get a slope (units per discount point) — the pricing
    elasticity screen.

    Exactness: discounts live on a 1/100 grid and quantities on an
    integer grid — both are scaled to exact BIGINTs (floor(v*100 +
    0.5), the cross-engine half-up), the five OLS moments are exact
    integer sums, and the slope is ONE fixed-order double expression
    (the events_autocorr discipline). Shape: a single partial-agg
    shuffle on l_partkey; output scales with the key like
    cdc_apply."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        F.expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
        .alias("x"),
        F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("y"),
    )
    m = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((F.col("n") >= ELASTICITY_MIN_N) & (den > 0))
        .select(
            "l_partkey", "n",
            # x is in discount points (1/100): slope per point * 100
            # = units per unit discount; keep points for readability
            (num.cast("double") / den.cast("double"))
            .alias("units_per_discount_point"),
        )
    )


DISCOUNT_QTY_ELASTICITY_SQL = f"""
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM li GROUP BY l_partkey
)
SELECT l_partkey, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE)
         AS units_per_discount_point
FROM m
WHERE n >= {ELASTICITY_MIN_N} AND n * sxx - sx * sx > 0
"""


QUERIES = {
    "events_cusum": events_cusum,
    "discount_qty_elasticity": discount_qty_elasticity,
}

ORACLES = {
    "events_cusum": EVENTS_CUSUM_SQL,
    "discount_qty_elasticity": DISCOUNT_QTY_ELASTICITY_SQL,
}
