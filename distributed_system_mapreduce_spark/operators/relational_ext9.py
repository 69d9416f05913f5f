"""Relational wave 11: lifecycle, governance, and calendar shapes.

- user_churn        : first-half vs second-half activity census —
                      churned / retained / new user accounting.
- l_diversity       : l-diversity companion to k_anonymity — how
                      many release cells carry too few DISTINCT
                      sensitive values (k-anonymous cells can still
                      leak when everyone in the cell shares the
                      sensitive attribute).
- events_dow_profile: day-of-week seasonality per event type with
                      an exact uniformity (TVD) score.
- top_clerks        : top-20 clerks by booked revenue — the global
                      top-k reporting staple.

Reference parity: SURVEY §2.C extensions; each is a maple+juice pair
in the reference's model (per-key reduce granularity,
/root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


# ----------------------------------------------------------- user_churn
def user_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn census over the observed horizon: split the time range
    at its midpoint; a user is churned if active only in the first
    half, new if only in the second, retained if both. One summary
    row with counts and the churn rate.

    Shape: the midpoint comes from a broadcast 2-value aggregate
    (events_drift pattern); per-user flags are one partial-agg
    shuffle (two boolean max's); the census is a single bounded
    aggregate. Integer counts; one double division at output."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lohi = F.broadcast(ev.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")))
    flags = (
        ev.crossJoin(lohi)
        .select(
            "user_id",
            (us < (F.col("lo") + F.col("hi")) / 2).alias("in_first"),
        )
        .groupBy("user_id")
        .agg(F.max(F.col("in_first")).alias("first_half"),
             F.max(~F.col("in_first")).alias("second_half"))
    )
    n_first = F.sum(F.col("first_half").cast("long"))
    churned = F.sum((F.col("first_half")
                     & ~F.col("second_half")).cast("long"))
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        n_first.cast("long").alias("n_first_half"),
        F.sum(F.col("second_half").cast("long")).cast("long")
        .alias("n_second_half"),
        churned.cast("long").alias("n_churned"),
        F.sum((~F.col("first_half") & F.col("second_half"))
              .cast("long")).cast("long").alias("n_new"),
        F.sum((F.col("first_half") & F.col("second_half"))
              .cast("long")).cast("long").alias("n_retained"),
        (churned.cast("double") / n_first.cast("double"))
        .alias("churn_rate"),
    )


USER_CHURN_SQL = """
WITH lohi AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
flags AS (
  SELECT user_id,
         MAX(CASE WHEN epoch_us(ts) < (lo + hi) / 2
                  THEN 1 ELSE 0 END) = 1 AS first_half,
         MAX(CASE WHEN epoch_us(ts) < (lo + hi) / 2
                  THEN 0 ELSE 1 END) = 1 AS second_half
  FROM events CROSS JOIN lohi
  GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT)
         AS n_first_half,
       CAST(SUM(CASE WHEN second_half THEN 1 ELSE 0 END) AS BIGINT)
         AS n_second_half,
       CAST(SUM(CASE WHEN first_half AND NOT second_half
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN NOT first_half AND second_half
                THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN first_half AND second_half
                THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN first_half AND NOT second_half
                THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CASE WHEN first_half THEN 1 ELSE 0 END) AS DOUBLE)
         AS churn_rate
FROM flags
"""


# ---------------------------------------------------------- l_diversity
L_DIV = 2
_VBUCKET = "CAST(floor(value / 50.0) AS BIGINT)"


def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the (event_type, day) release cells
    k_anonymity already scores: a cell whose members all share the
    same SENSITIVE attribute (here the coarse value bucket) leaks
    even when it is k-anonymous. Per type: min l across cells, cells
    below L_DIV, and the share of observations in those cells.

    Shape: two partial-agg shuffles — distinct sensitive buckets per
    cell (two-phase distinct on the cell key), then the bounded
    per-type rollup. Exact integers; one double division."""
    ev = load_table(spark, "events", sf_dir)
    cells = (
        ev.select(
            "event_type", F.to_date("ts").alias("day"),
            F.expr(_VBUCKET).alias("sens"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.countDistinct("sens").cast("long").alias("l"),
            F.count(F.lit(1)).cast("long").alias("n_obs"),
        )
    )
    weak = F.col("l") < L_DIV
    return (
        cells.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("l").alias("min_l"),
            F.sum(weak.cast("long")).cast("long").alias("n_weak_cells"),
            F.sum(F.when(weak, F.col("n_obs")).otherwise(0))
            .cast("long").alias("obs_at_risk"),
            F.sum("n_obs").cast("long").alias("n_obs"),
        )
        .select(
            "event_type", "n_cells", "min_l", "n_weak_cells",
            "obs_at_risk", "n_obs",
            (F.col("obs_at_risk").cast("double")
             / F.col("n_obs").cast("double")).alias("risk_share"),
        )
    )


L_DIVERSITY_SQL = f"""
WITH cells AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT {_VBUCKET}) AS BIGINT) AS l,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM events
  GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       MIN(l) AS min_l,
       CAST(SUM(CASE WHEN l < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weak_cells,
       CAST(SUM(CASE WHEN l < {L_DIV} THEN n_obs ELSE 0 END) AS BIGINT)
         AS obs_at_risk,
       CAST(SUM(n_obs) AS BIGINT) AS n_obs,
       CAST(SUM(CASE WHEN l < {L_DIV} THEN n_obs ELSE 0 END) AS DOUBLE)
         / CAST(SUM(n_obs) AS DOUBLE) AS risk_share
FROM cells GROUP BY event_type
"""


# ---------------------------------------------------- events_dow_profile
def events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: the peak weekday, its
    share, and the total-variation distance from a uniform weekly
    profile — the calendar-effect screen run before comparing
    windows that start on different weekdays.

    Exactness: dow is pure integer arithmetic ((epoch_days + 4) % 7,
    engine-independent — built-in dayofweek origins differ across
    engines); the TVD accumulates Σ|7·c − N| in exact integers,
    adding N for each ABSENT weekday (a missing row still
    contributes |0·7 − N|), with one double division at output. Peak
    selection is a min(struct) total order (count desc, dow asc).
    Shape: one partial-agg shuffle to the bounded (type, dow) table,
    then a bounded per-type fold."""
    ev = load_table(spark, "events", sf_dir)
    dow = ((F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            + 4) % 7).alias("dow")
    d = (
        ev.select("event_type", dow)
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = d.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_dows"))
    return (
        d.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n_events"),
            F.min(F.struct((-F.col("c")).alias("nc"),
                           F.col("dow").alias("d"))).alias("pk"),
            ((F.sum(F.abs(F.lit(7) * F.col("c") - F.col("n")))
              + (F.lit(7) - F.min("n_dows")) * F.min("n"))
             .cast("double")
             / (F.lit(14.0) * F.min("n").cast("double")))
            .alias("uniform_tvd"),
        )
        .select(
            "event_type", "n_events",
            F.col("pk.d").alias("peak_dow"),
            ((-F.col("pk.nc")).cast("double")
             / F.col("n_events").cast("double")).alias("peak_share"),
            "uniform_tvd",
        )
    )


EVENTS_DOW_PROFILE_SQL = """
WITH d AS (
  SELECT event_type,
         (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 4) % 7
           AS dow,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_dows
  FROM d GROUP BY event_type
),
pk AS (
  SELECT event_type, dow, c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY c DESC, dow ASC) AS rn
  FROM d
)
SELECT t.event_type, t.n AS n_events,
       pk.dow AS peak_dow,
       CAST(pk.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS peak_share,
       CAST((SELECT SUM(abs(7 * d.c - t.n)) FROM d
             WHERE d.event_type = t.event_type)
            + (7 - t.n_dows) * t.n AS DOUBLE)
         / (14.0 * CAST(t.n AS DOUBLE)) AS uniform_tvd
FROM tot t JOIN pk ON pk.event_type = t.event_type AND pk.rn = 1
"""


# ---------------------------------------------------- top_returned_parts
RETURN_TOPK = 20


def top_returned_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by RETURNED revenue (l_returnflag = 'R') with
    return-line counts — the product-quality leaderboard q10 runs at
    customer grain, here at part grain. Global top-k is
    TakeOrderedAndProject over the per-part aggregate (one
    partial-agg shuffle, filter pushed to the scan; never a global
    sort); ranking compares the EXACT decimal revenue (ties to
    partkey) and the output casts to DOUBLE once."""
    li = load_table(spark, "lineitem", sf_dir)
    agg = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_return_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")
                  * (F.lit(1).cast("decimal(9,4)")
                     - F.col("l_discount").cast("decimal(9,4)")))
            .alias("rev"),
        )
    )
    return (
        agg.orderBy(F.desc("rev"), F.asc("l_partkey"))
        .limit(RETURN_TOPK)
        .select(
            "l_partkey", "n_return_lines",
            F.col("rev").cast("double").alias("returned_revenue"),
        )
    )


TOP_RETURNED_PARTS_SQL = f"""
SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_return_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(9,4))
                   - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE)
         AS returned_revenue
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_partkey
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(9,4))
                - CAST(l_discount AS DECIMAL(9,4)))) DESC,
         l_partkey ASC
LIMIT {RETURN_TOPK}
"""


QUERIES = {
    "user_churn": user_churn,
    "l_diversity": l_diversity,
    "events_dow_profile": events_dow_profile,
    "top_returned_parts": top_returned_parts,
}

ORACLES = {
    "user_churn": USER_CHURN_SQL,
    "l_diversity": L_DIVERSITY_SQL,
    "events_dow_profile": EVENTS_DOW_PROFILE_SQL,
    "top_returned_parts": TOP_RETURNED_PARTS_SQL,
}
