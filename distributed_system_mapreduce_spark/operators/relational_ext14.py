"""Relational wave 18: association rules and experiment analysis.

- assoc_rules   : market-basket association rules (support,
                  confidence both directions, lift) over co-ordered
                  part pairs — basket_pairs' reporting sibling with
                  the full rule statistics.
- ab_test_zstat : two-proportion z-test for a hash-split A/B
                  experiment on user conversion — the experiment
                  readout computed exactly from four integers.

Reference parity: SURVEY §2.C extensions (maple+juice pairs in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut

MIN_SUPPORT = 2
_DAY_US = 86_400_000_000


# ------------------------------------------------------------ assoc_rules
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-ordered parts: for every pair with
    support >= MIN_SUPPORT, the support count, P(b|a), P(a|b), and
    lift — the full rule statistics a recommender shortlist needs
    beyond basket_pairs' raw co-occurrence top-k.

    Shape: the per-order sorted part-SET table (order_part_sets) is
    the shared input of every branch — localCheckpointed, because the
    basket total, the per-item counts, and the pair expansion all
    reference it. collect_set dedups, so the old distinct() +
    countDistinct pre-pass (a full extra corpus shuffle before the
    order grouping, r10 plan audit) is gone: ONE groupBy(l_orderkey)
    shuffle builds the statistic; basket total = its row count,
    per-item basket counts = explode + partial-agg count, pairs =
    the bounded in-array expansion (fan-out lines-per-order choose 2,
    linear in orders). All counts exact; confidences and lift are
    fixed-order double divisions."""
    from distributed_system_mapreduce_spark.functions.graphs import (
        explode_pairs,
        order_part_sets,
    )

    li = load_table(spark, "lineitem", sf_dir)
    sets = order_part_sets(li).transform(cut)
    n_baskets = F.broadcast(
        sets.agg(F.count(F.lit(1)).cast("long").alias("nb")))
    item = sets.select(F.explode("a").alias("l_partkey")).groupBy(
        "l_partkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pairs = (
        explode_pairs(sets)
        .groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
        .select(F.col("u").alias("part_a"),
                F.col("v").alias("part_b"),
                F.col("w").cast("long").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"),
                     F.col("cnt").alias("cnt_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"),
                     F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(ia, "part_a").join(ib, "part_b")
        .crossJoin(n_baskets)
        .select(
            "part_a", "part_b", "support", "cnt_a", "cnt_b",
            (F.col("support").cast("double")
             / F.col("cnt_a").cast("double")).alias("conf_a_to_b"),
            (F.col("support").cast("double")
             / F.col("cnt_b").cast("double")).alias("conf_b_to_a"),
            ((F.col("support").cast("double")
              * F.col("nb").cast("double"))
             / (F.col("cnt_a").cast("double")
                * F.col("cnt_b").cast("double"))).alias("lift"),
        )
    )


ASSOC_RULES_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM li),
item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM li GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_SUPPORT}
)
SELECT part_a, part_b, support,
       ia.cnt AS cnt_a, ib.cnt AS cnt_b,
       CAST(support AS DOUBLE) / CAST(ia.cnt AS DOUBLE)
         AS conf_a_to_b,
       CAST(support AS DOUBLE) / CAST(ib.cnt AS DOUBLE)
         AS conf_b_to_a,
       (CAST(support AS DOUBLE) * CAST(nb AS DOUBLE))
         / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)) AS lift
FROM pairs
JOIN item ia ON pairs.part_a = ia.l_partkey
JOIN item ib ON pairs.part_b = ib.l_partkey
CROSS JOIN nb
"""


# ---------------------------------------------------------- ab_test_zstat
def ab_test_zstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for a deterministic hash-split A/B
    experiment: users whose md5 leads below '8' are arm A, the rest
    arm B; the outcome is conversion (any purchase event). Reports
    the four exact counts, both rates, and the pooled z statistic —
    the experiment readout, reproducible because the assignment is a
    pure hash of the user id (the train_val_split wall discipline,
    salted 'ab:' so it is independent of every other hash decision).

    Shape: one per-user partial agg, then a 1-row census; the z is
    ONE fixed-order double expression over exact integers (IEEE
    sqrt)."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type")
    per_user = (
        ev.groupBy("user_id")
        .agg(F.max((F.col("event_type") == "purchase").cast("long"))
             .alias("converted"))
        .select(
            (F.substring(F.md5(F.concat(F.lit("ab:"),
                                        F.col("user_id").cast("string"))),
                         1, 1) < "8").alias("arm_a"),
            "converted",
        )
    )
    na = F.sum(F.col("arm_a").cast("long"))
    xa = F.sum(F.when(F.col("arm_a"), F.col("converted")).otherwise(0))
    nb = F.sum((~F.col("arm_a")).cast("long"))
    xb = F.sum(F.when(~F.col("arm_a"), F.col("converted")).otherwise(0))
    agg = per_user.agg(
        na.cast("long").alias("n_a"), xa.cast("long").alias("x_a"),
        nb.cast("long").alias("n_b"), xb.cast("long").alias("x_b"))
    pa = F.col("x_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("x_b").cast("double") / F.col("n_b").cast("double")
    pool = ((F.col("x_a") + F.col("x_b")).cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double"))
    se = F.sqrt(pool * (F.lit(1.0) - pool)
                * (F.lit(1.0) / F.col("n_a").cast("double")
                   + F.lit(1.0) / F.col("n_b").cast("double")))
    return agg.select(
        "n_a", "x_a", "n_b", "x_b",
        pa.alias("rate_a"), pb.alias("rate_b"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0),
               (pa - pb) / se).alias("z"),
    )


AB_TEST_ZSTAT_SQL = """
WITH per_user AS (
  SELECT substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
           AS arm_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN arm_a THEN converted ELSE 0 END) AS BIGINT)
      AS x_a,
    CAST(SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN arm_a THEN 0 ELSE converted END) AS BIGINT)
      AS x_b
  FROM per_user
)
SELECT n_a, x_a, n_b, x_b,
       CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
       CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND
                 sqrt((CAST(x_a + x_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - CAST(x_a + x_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))) > 0
       THEN (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
            / sqrt((CAST(x_a + x_b AS DOUBLE)
                    / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - CAST(x_a + x_b AS DOUBLE)
                            / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE)
                      + 1.0 / CAST(n_b AS DOUBLE)))
       END AS z
FROM agg
"""


# ----------------------------------------------------- events_grouping_sets
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((type), (month), ()) — the ad-hoc
    granularity list that is neither ROLLUP (events_rollup) nor CUBE
    (events_cube): per-type totals, per-month totals, and the grand
    total in ONE pass, skipping the (type, month) cells a dashboard
    does not want to pay for. Still one shuffle with map-side
    partials over the expanded sets; grouping_id disambiguates."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("__ev_gs")
    return spark.sql("""
        SELECT event_type,
               CAST(date_trunc('month', ts) AS DATE) AS month,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_value,
               CAST(grouping_id() AS BIGINT) AS gid
        FROM __ev_gs
        GROUP BY GROUPING SETS ((event_type),
                                (CAST(date_trunc('month', ts) AS DATE)),
                                ())
    """)


EVENTS_GROUPING_SETS_SQL = """
SELECT event_type,
       CAST(date_trunc('month', ts) AS DATE) AS month,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
            AS DOUBLE) AS sum_value,
       GROUPING(event_type,
                CAST(date_trunc('month', ts) AS DATE)) AS gid
FROM events
GROUP BY GROUPING SETS ((event_type),
                        (CAST(date_trunc('month', ts) AS DATE)),
                        ())
"""


DECAY_WEEK_CAP = 60  # 1<<w stays in BIGINT; older mass rounds to 2^-60


def decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed popularity per event type — the
    freshness-weighted score feeds ranking/trending far better than a
    raw count (a type with all its volume last week beats one with
    the same volume a year ago). Half-life = one week: an event w
    full weeks before the corpus max day weighs 2^-w.

    Exact cross-engine despite being an exponential sum: weights are
    DYADIC (2^-w via integer shift, never pow/exp — libm rounding
    differs per engine), per-(type, week) counts are exact BIGINTs,
    each term n*2^-w is an exact double product (n < 2^53), and the
    ~60-bucket series is summed with a strict left fold in week order
    so both engines execute the identical IEEE sequence (the
    user_survival_km discipline). Shape: one partial-agg shuffle to
    the bounded (type, week) grid; the corpus max-day is a broadcast
    1-row aggregate; the fold runs on <= 60 elements per type."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}")
        .alias("day"))
    maxd = F.broadcast(ev.agg(F.max("day").alias("maxd")))
    weekly = (
        ev.crossJoin(maxd)
        .select("event_type",
                F.expr(f"LEAST((maxd - day) DIV 7, {DECAY_WEEK_CAP})")
                .alias("w"))
        .groupBy("event_type", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        weekly.groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(w, n))), "
                "e -> CAST(e.n AS DOUBLE)"
                " / CAST(shiftleft(CAST(1 AS BIGINT), CAST(e.w AS INT))"
                "        AS DOUBLE)), "
                "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("decayed_score"),
        )
        .select(
            "event_type", "n_events", "decayed_score",
            (F.col("decayed_score")
             / F.col("n_events").cast("double")).alias("freshness"),
        )
    )


DECAYED_POPULARITY_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // {_DAY_US} AS day
  FROM events
),
maxd AS (SELECT MAX(day) AS maxd FROM ev),
weekly AS (
  SELECT event_type,
         LEAST((maxd - day) // 7, {DECAY_WEEK_CAP}) AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev CROSS JOIN maxd
  GROUP BY 1, 2
),
scored AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS n_events,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(n AS DOUBLE)
                  / CAST(CAST(1 AS BIGINT) << CAST(w AS INT) AS DOUBLE)
                  ORDER BY w)),
           (acc, x) -> acc + x) AS decayed_score
  FROM weekly GROUP BY event_type
)
SELECT event_type, n_events, decayed_score,
       decayed_score / CAST(n_events AS DOUBLE) AS freshness
FROM scored
"""


QUERIES = {
    "assoc_rules": assoc_rules,
    "ab_test_zstat": ab_test_zstat,
    "events_grouping_sets": events_grouping_sets,
    "decayed_popularity": decayed_popularity,
}

ORACLES = {
    "assoc_rules": ASSOC_RULES_SQL,
    "ab_test_zstat": AB_TEST_ZSTAT_SQL,
    "events_grouping_sets": EVENTS_GROUPING_SETS_SQL,
    "decayed_popularity": DECAYED_POPULARITY_SQL,
}
