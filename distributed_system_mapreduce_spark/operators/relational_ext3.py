"""Relational wave 3: semi-structured JSON extraction, cohort
retention, and hopping (sliding) windows over the events stream.

These are the remaining "queries they run today" shapes a user of the
reference would hand-roll as maple/juice chains (per-line JSON field
grep → key shuffle; two-round first-touch cohort assignment) — each
here is ONE Catalyst plan. Exactness discipline matches relational.py:
DECIMAL accumulators for money, integer arithmetic for time bucketing,
final outputs cast to DOUBLE/BIGINT so the driver's value hash is
engine-independent.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table

# Monday anchor for week bucketing: integer day arithmetic against a
# fixed Monday epoch gives identical weeks in both engines without
# relying on date_trunc('week') locale/mode agreement.
_MONDAY_EPOCH = datetime.date(1970, 1, 5)


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column and
    aggregate the numeric ``$.k`` field per event type.

    Scale: get_json_object is a JVM codegen expression (no Python in
    the loop), evaluated during the scan's narrow projection; the agg
    is a single partial-agg shuffle on event_type. The distinct count
    is exact (Expand + two-phase agg); swap for approx_count_distinct
    at extreme cardinalities. Reference analogue: a maple exe that
    greps a field out of each line, then a juice count per key
    (/root/reference/maple_juice/maple_juice.go:241 exe contract).
    """
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    n_with_k = F.count("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            n_with_k.alias("n_with_k"),
            F.countDistinct("k").alias("n_k_distinct"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            # single division of exact ints -> deterministic double;
            # guarded: ANSI sessions throw on 0/0
            F.when(
                n_with_k > 0,
                F.sum("k").cast("double") / n_with_k.cast("double"),
            ).alias("avg_k"),
        )
    )


EVENTS_PROPS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(k) AS n_with_k,
       COUNT(DISTINCT k) AS n_k_distinct,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CASE WHEN COUNT(k) > 0 THEN
         CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE)
       END AS avg_k
FROM (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week, counted in each subsequent week they return.

    Plan: ONE shuffle on user_id builds the per-user week set
    (collect_set is bounded by the number of distinct weeks in the
    corpus — a calendar-bounded constant, not data-scaled), the cohort
    week is array_min of that set (no second pass / no join back), and
    the final (cohort, offset) rollup is a partial-agg shuffle over at
    most weeks² groups. count(*) is exact distinct users because each
    user contributes each week at most once by construction.
    """
    ev = load_table(spark, "events", sf_dir)
    wk = F.floor(
        F.datediff(F.to_date(F.col("ts")), F.lit(_MONDAY_EPOCH)) / 7
    ).cast("int")
    per_user = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.collect_set("wk").alias("wks"))
    )
    exploded = per_user.select(
        F.array_min("wks").alias("cohort_wk"),
        F.explode("wks").alias("wk"),
    )
    return (
        exploded.groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_add(F.lit(_MONDAY_EPOCH), F.col("cohort_wk") * 7)
            .alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


EVENTS_RETENTION_SQL = """
WITH wku AS (
  SELECT DISTINCT user_id,
         CAST(floor(date_diff('day', DATE '1970-01-05', CAST(ts AS DATE))
                    / 7) AS INT) AS wk
  FROM events
),
labeled AS (
  SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
  FROM wku
)
SELECT DATE '1970-01-05' + cohort_wk * 7 AS cohort_week,
       wk - cohort_wk AS week_offset,
       COUNT(*) AS n_users
FROM labeled
GROUP BY 1, 2
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup: 24h windows sliding every 6h, per event
    type — the overlapping-window twin of events_daily_rollup (each
    event lands in exactly size/slide = 4 windows).

    Spark's native window() generator handles the fan-out JVM-side
    (epoch-aligned starts, same origin as DuckDB's time_bucket); the
    agg is one partial-agg shuffle. The streaming twin is
    streaming/jobs.windowed_counts with the same window spec.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 day", "6 hours").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


EVENTS_SLIDING_SQL = """
SELECT time_bucket(INTERVAL 6 hours, ts) - r.k * INTERVAL 6 hours
         AS win_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events CROSS JOIN range(0, 4) AS r(k)
GROUP BY 1, 2
"""


def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining: the 20 most common event-type trigrams across
    per-user ordered event streams (the "what do users do next"
    path-analysis query).

    Plan: lead() windows partitioned by user_id (never global), one
    partial-agg shuffle over at most |types|³ groups, global top-20 as
    TakeOrderedAndProject with a full deterministic tie-break.
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        paths.groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(20)
    )


EVENTS_PATH_TRIGRAMS_SQL = """
SELECT t1, t2, t3, COUNT(*) AS n_paths
FROM (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n_paths DESC, t1 ASC, t2 ASC, t3 ASC
LIMIT 20
"""


def events_skew_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rollup through the SALTED two-phase aggregation path
    (functions/skew.py) — the hot-key posture for when one key owns a
    double-digit share of a 100 TB table and a single reducer would
    choke. Salting is value-neutral for associative aggregates, so
    the oracle is the plain GROUP BY: identical output is exactly the
    property that makes the salted plan safe to swap in at scale.

    Exactness: value goes through a DECIMAL accumulator BEFORE the
    two-phase sum (decimal addition is associative; a double sum
    would be partitioning-dependent), final output cast to DOUBLE.
    """
    from distributed_system_mapreduce_spark.functions.skew import salted_agg

    ev = load_table(spark, "events", sf_dir).withColumn(
        "v", F.col("value").cast("decimal(18,6)"))
    out = salted_agg(
        ev, "event_type",
        {"n_events": ("count", "*"), "sum_value": ("sum", "v")},
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


EVENTS_SKEW_ROLLUP_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 part pairs most often
    ordered together (support = number of orders containing both).

    Scale shape: the self-join is keyed on l_orderkey, so the pair
    fan-out per order is (lines choose 2) — bounded by the 7-line
    TPC-H order cap, i.e. LINEAR in orders, never corpus x corpus.
    One equi-join shuffle + one partial-agg shuffle + TakeOrdered
    top-k with a full tie-break."""
    from distributed_system_mapreduce_spark.functions.graphs import (
        copair_counts,
    )

    li = load_table(spark, "lineitem", sf_dir)
    return (
        copair_counts(li)
        .select(F.col("u").alias("part_a"),
                F.col("v").alias("part_b"),
                F.col("w").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


BASKET_PAIRS_SQL = """
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
"""


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day — the stickiness ratio every
    growth dashboard wants, which needs a ROLLING DISTINCT (windowed
    count-distincts don't merge).

    The scale trick: reduce to distinct (user, day) pairs first (one
    shuffle, corpus -> bounded), then explode each pair onto the 7
    days it covers and count distinct per target day — the fan-out is
    x7 on the ALREADY-distinct pairs, not on raw events. Ratio is a
    single exact-int division. Days with no 7-day history still
    report (their window is just shorter)."""
    ev = load_table(spark, "events", sf_dir)
    pairs = ev.select(
        F.to_date("ts").alias("day"), "user_id").distinct()
    dau = pairs.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau"))
    covering = pairs.select(
        F.explode(F.expr(
            "sequence(day, date_add(day, 6))")).alias("day"),
        "user_id",
    )
    wau = covering.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day", "dau", "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double"))
            .alias("stickiness"),
        )
    )


EVENTS_DAU_WAU_SQL = """
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (
  SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY day
),
wau AS (
  SELECT day + CAST(k AS INTEGER) AS day, COUNT(DISTINCT user_id) AS wau
  FROM pairs CROSS JOIN range(0, 7) AS r(k)
  GROUP BY 1
)
SELECT day, dau, wau,
       CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
FROM dau JOIN wau USING (day)
"""


QUERIES = {
    "events_props_stats": events_props_stats,
    "events_retention": events_retention,
    "events_sliding_window": events_sliding_window,
    "events_path_trigrams": events_path_trigrams,
    "events_skew_rollup": events_skew_rollup,
    "basket_pairs": basket_pairs,
    "events_dau_wau": events_dau_wau,
}

ORACLES = {
    "events_props_stats": EVENTS_PROPS_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "events_sliding_window": EVENTS_SLIDING_SQL,
    "events_path_trigrams": EVENTS_PATH_TRIGRAMS_SQL,
    "events_skew_rollup": EVENTS_SKEW_ROLLUP_SQL,
    "basket_pairs": BASKET_PAIRS_SQL,
    "events_dau_wau": EVENTS_DAU_WAU_SQL,
}
