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
from distributed_system_mapreduce_spark.lineage import cut


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


# -------------------------------------------------------- join_key_skew
_SKEW_KEYS = ("l_partkey", "l_suppkey", "l_orderkey")


def join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew census over the fact table: for each candidate
    join key, the key cardinality, heaviest-key count, exact p99 of
    the per-key count distribution, and the row share held by keys
    at-or-above that p99 — the diagnostic that decides whether a join
    needs salting (functions/skew.py) before it ships.

    Shape: ONE column-pruned scan for all keys — each row explodes
    into (key_col, key_val) pairs so the three per-key count tables
    come out of a single shuffle (same shuffled bytes as three
    per-key jobs, a third of the fact-table reads — r7 scan audit
    measured 6 scans in the per-key-loop shape, this is 1). The
    bounded count table is localCheckpointed (its two consumers — the
    exact-percentile stats and the heavy-rows sum — would each replay
    the scan otherwise); per-key p99 is a grouped exact percentile
    (interpolation parity with quantile_cont; swap approx_percentile
    when the KEY cardinality itself is unbounded) broadcast back onto
    the count table. Counts exact; the share is one double
    division."""
    li = load_table(spark, "lineitem", sf_dir)
    # int tag in the shuffle (a third the tag bytes of the column
    # name); mapped back to the name on the bounded post-agg rows
    pairs = li.select(F.explode(F.array(*[
        F.struct(F.lit(i).cast("int").alias("kid"),
                 F.col(k).cast("long").alias("key_val"))
        for i, k in enumerate(_SKEW_KEYS)
    ])).alias("e")).select("e.*")
    counts = (
        pairs.groupBy("kid", "key_val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # both consumers below sit on the IDENTICAL (kid, key_val)
    # exchange, so AQE plans the second as a ReusedExchange — no
    # barrier needed (the fk_integrity-style checkpoint measured
    # slower here: materializing the 170k-row count table costs more
    # than the reused shuffle read)
    stats = F.broadcast(counts.groupBy("kid").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.expr("percentile(cnt, 0.99)").alias("p99_cnt"),
    ))
    name = F.array(*[F.lit(k) for k in _SKEW_KEYS])
    return (
        counts.join(stats, "kid")
        .groupBy("kid", "n_keys", "n_rows", "max_cnt", "p99_cnt")
        .agg(F.sum(F.when(F.col("cnt") >= F.col("p99_cnt"),
                          F.col("cnt")).otherwise(0))
             .cast("long").alias("heavy_rows"))
        .select(
            F.element_at(name, F.col("kid") + 1).alias("key_col"),
            "n_keys", "n_rows", "max_cnt", "p99_cnt",
            (F.col("heavy_rows").cast("double")
             / F.col("n_rows").cast("double")).alias("heavy_share"),
        )
    )


def _skew_block_sql(k: str) -> str:
    return f"""
  SELECT '{k}' AS key_col, n_keys, n_rows, max_cnt, p99_cnt,
         CAST(heavy_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
           AS heavy_share
  FROM (
    SELECT MIN(n_keys) AS n_keys, MIN(n_rows) AS n_rows,
           MIN(max_cnt) AS max_cnt, MIN(p99_cnt) AS p99_cnt,
           CAST(SUM(CASE WHEN cnt >= p99_cnt THEN cnt ELSE 0 END)
                AS BIGINT) AS heavy_rows
    FROM (SELECT {k} AS key, COUNT(*) AS cnt
          FROM lineitem GROUP BY {k}) c
    CROSS JOIN (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             quantile_cont(cnt, 0.99) AS p99_cnt
      FROM (SELECT {k} AS key, COUNT(*) AS cnt
            FROM lineitem GROUP BY {k}) s
    ) st
  )
"""


JOIN_KEY_SKEW_SQL = " UNION ALL ".join(
    _skew_block_sql(k) for k in _SKEW_KEYS)


# --------------------------------------------------------- revenue_gini
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of per-customer order revenue — the
    whole Lorenz-curve inequality summary, not just a top-k share
    (revenue_concentration reports that point estimate).

    Gini needs every customer's GLOBAL revenue rank — the classic
    "requires a total order" trap. Never a single-partition window:
    ranks come from the partitioned prefix-sum stitch
    (range_partition_hist discipline) — repartitionByRange on
    (revenue, custkey), per-partition counts to O(#partitions)
    driver state, broadcast offsets + within-partition row_number.
    Arithmetic: revenue in exact integer cents, the rank-weighted
    sum Σ(2i-n-1)·x_i in exact BIGINTs (fits under 2^53 through
    sf0.1; widen to DECIMAL(38,0) + the DIV/% split beyond), ONE
    double division at output."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    rev = (
        orders.groupBy("o_custkey")
        .agg((F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
              * 100).cast("long").alias("cents"))
    )
    kr = (
        rev.repartitionByRange(32, "cents", "o_custkey")
        .withColumn("pid", F.spark_partition_id())
        .transform(cut)
    )
    ptots = {
        r["pid"]: r["n"]
        for r in kr.groupBy("pid").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, run = [], 0
    for pid in sorted(ptots):
        offsets.append((pid, run))
        run += ptots[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)],
                                   "pid int, off long")
    w = Window.partitionBy("pid").orderBy("cents", "o_custkey")
    ranked = (
        kr.withColumn("i_in", F.row_number().over(w))
        .join(F.broadcast(off_df), "pid")
        .select("cents", (F.col("i_in") + F.col("off")).alias("i"))
    )
    n = F.lit(run).cast("long")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum((2 * F.col("i") - n - 1) * F.col("cents"))
        .cast("long").alias("num"),
    )
    return agg.select(
        "n_customers",
        (F.col("total_cents").cast("double") / F.lit(100.0))
        .alias("total_revenue"),
        (F.col("num").cast("double")
         / (F.col("n_customers").cast("double")
            * F.col("total_cents").cast("double"))).alias("gini"),
    )


REVENUE_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) * 100
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM rev
)
SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0
         AS total_revenue,
       CAST(CAST(SUM((2 * i - n - 1) * cents) AS BIGINT)
            AS DOUBLE)
         / (CAST(MIN(n) AS DOUBLE)
            * CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)) AS gini
FROM ranked
"""


QUERIES = {
    "events_cusum": events_cusum,
    "discount_qty_elasticity": discount_qty_elasticity,
    "join_key_skew": join_key_skew,
    "revenue_gini": revenue_gini,
}

ORACLES = {
    "events_cusum": EVENTS_CUSUM_SQL,
    "discount_qty_elasticity": DISCOUNT_QTY_ELASTICITY_SQL,
    "join_key_skew": JOIN_KEY_SKEW_SQL,
    "revenue_gini": REVENUE_GINI_SQL,
}
