"""Calendar/mix analytics, wave 17:

- orders_seasonal_index: classic seasonal index per calendar month —
                         average monthly revenue for that month
                         across years over the all-months average.
                         The de-seasonalizing divisor every
                         forecasting pipeline needs before trend
                         fitting (events_holt_forecast's relational
                         cousin on the orders feed).
- supplier_volume_skew : top-10 suppliers by lineitem volume with
                         name, share, and ratio-to-mean — the
                         operational hot-key census (one hot supplier
                         key = one hot partition downstream);
                         join_key_skew gives the distribution-wide
                         percentile view, this names the offenders.
- priority_share_shift : per order priority, the month with the
                         largest month-over-month shift in priority
                         mix — the mix-shift detector that catches
                         an upstream feed or policy change
                         (returns_mix_shift's order-intake twin).

Exactness (the q1 discipline): revenue rolls up through
DECIMAL(18,4) accumulators; counts are BIGINT; every output double
is one fixed-order expression over those exact values, written as
the same text in both engines. Shares are ratios of exact integer
counts, so the MoM deltas subtract identically.

Scale shape (100 TB): everything partial-aggregates onto bounded
calendar / clerk / mode grids before any join; the only windows
partition by priority over the bounded month grid; top-k is
TakeOrderedAndProject; totals ride broadcast 1-row joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table


# ---------------------------------------------------- orders_seasonal_index
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index per calendar month: (avg revenue of that month
    across years) / (avg revenue across all year-months). Index > 1 =
    seasonally strong month. Monthly revenue is DECIMAL-exact; the
    index is a ratio of two fixed-order doubles."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
          .alias("rev"))
    per_month = monthly.groupBy("m").agg(
        F.count("*").cast("long").alias("n_years"),
        F.sum("rev").alias("tot"),
    )
    grand = monthly.groupBy().agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("rev").alias("gt"),
    )
    return (
        per_month.crossJoin(F.broadcast(grand))
        .selectExpr(
            "CAST(m AS BIGINT) AS month", "n_years",
            "CAST(tot AS DOUBLE) AS month_revenue",
            "(CAST(tot AS DOUBLE) / n_years)"
            " / (CAST(gt AS DOUBLE) / ng) AS seasonal_index",
        )
    )


ORDERS_SEASONAL_INDEX_SQL = """
WITH monthly AS (
  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1, 2
),
per_month AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_years, SUM(rev) AS tot
  FROM monthly GROUP BY m
),
grand AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ng, SUM(rev) AS gt FROM monthly
)
SELECT CAST(m AS BIGINT) AS month, n_years,
       CAST(tot AS DOUBLE) AS month_revenue,
       (CAST(tot AS DOUBLE) / n_years)
         / (CAST(gt AS DOUBLE) / ng) AS seasonal_index
FROM per_month CROSS JOIN grand
"""


# ---------------------------------------------------- supplier_volume_skew
SUPPLIER_TOPK = 10


def supplier_volume_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by lineitem row volume with their corpus
    share and ratio to the mean supplier load — the named hot-key
    census (join_key_skew reports the percentile envelope; this
    names the offenders). One partial agg onto the supplier grid,
    top-k via TakeOrderedAndProject, the supplier dim broadcast onto
    10 rows, totals broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    per = li.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n_rows"))
    tot = per.groupBy().agg(
        F.sum("n_rows").cast("long").alias("nt"),
        F.count("*").cast("long").alias("n_suppliers"),
    )
    return (
        per.orderBy(F.desc("n_rows"), F.asc("l_suppkey"))
        .limit(SUPPLIER_TOPK)
        .join(F.broadcast(sup.select(
            F.col("s_suppkey").alias("l_suppkey"),
            F.col("s_name").alias("supplier"))), "l_suppkey")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "l_suppkey AS suppkey", "supplier", "n_rows", "n_suppliers",
            "CAST(n_rows AS DOUBLE) / nt AS share",
            "CAST(n_rows AS DOUBLE) / (CAST(nt AS DOUBLE)"
            " / n_suppliers) AS ratio_to_mean",
        )
    )


SUPPLIER_VOLUME_SKEW_SQL = f"""
WITH per AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_suppkey
),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS nt,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM per
),
top AS (
  SELECT l_suppkey, n_rows FROM per
  ORDER BY n_rows DESC, l_suppkey ASC LIMIT {SUPPLIER_TOPK}
)
SELECT l_suppkey AS suppkey, s_name AS supplier, n_rows, n_suppliers,
       CAST(n_rows AS DOUBLE) / nt AS share,
       CAST(n_rows AS DOUBLE) / (CAST(nt AS DOUBLE) / n_suppliers)
         AS ratio_to_mean
FROM top JOIN supplier ON l_suppkey = s_suppkey CROSS JOIN tot
"""


# ----------------------------------------------------- priority_share_shift
def priority_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: the month with the largest absolute
    month-over-month change in that priority's share of order intake
    — the mix-shift detector. Shares are ratios of exact integer
    counts; deltas compare CONSECUTIVE OBSERVED months (a month with
    zero orders for a priority simply isn't a row — identical
    construction in both engines). Windows partition by priority
    over the bounded month grid."""
    orders = load_table(spark, "orders", sf_dir)
    cell = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long").alias("mi"),
        F.col("o_orderpriority").alias("mode"),
    ).agg(F.count("*").cast("long").alias("c"))
    mtot = cell.groupBy("mi").agg(F.sum("c").cast("long").alias("mt"))
    share = (
        cell.join(F.broadcast(mtot), "mi")
        .select("mode", "mi",
                (F.col("c").cast("double") / F.col("mt"))
                .alias("share"))
    )
    w = Window.partitionBy("mode").orderBy("mi")
    delta = (
        share.withColumn("prev_share", F.lag("share").over(w))
        .withColumn("prev_mi", F.lag("mi").over(w))
        .filter(F.col("prev_share").isNotNull())
        .withColumn("d", F.col("share") - F.col("prev_share"))
        .withColumn("ad", F.abs(F.col("share") - F.col("prev_share")))
    )
    rk = Window.partitionBy("mode").orderBy(F.desc("ad"), F.asc("mi"))
    return (
        delta.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .selectExpr("mode AS priority", "mi AS month_idx",
                    "prev_mi AS prev_idx",
                    "share", "prev_share", "d AS share_delta")
    )


PRIORITY_SHARE_SHIFT_SQL = """
WITH cell AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS mi,
         o_orderpriority AS mode, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
mtot AS (SELECT mi, CAST(SUM(c) AS BIGINT) AS mt FROM cell GROUP BY mi),
share AS (
  SELECT mode, mi, CAST(c AS DOUBLE) / mt AS share
  FROM cell JOIN mtot USING (mi)
),
delta AS (
  SELECT mode, mi, share,
         LAG(share) OVER (PARTITION BY mode ORDER BY mi) AS prev_share,
         LAG(mi) OVER (PARTITION BY mode ORDER BY mi) AS prev_mi
  FROM share
)
SELECT mode AS priority, mi AS month_idx, prev_mi AS prev_idx, share,
       prev_share, share - prev_share AS share_delta
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY mode
           ORDER BY abs(share - prev_share) DESC, mi ASC) AS rn
  FROM delta WHERE prev_share IS NOT NULL
)
WHERE rn = 1
"""


QUERIES = {
    "orders_seasonal_index": orders_seasonal_index,
    "supplier_volume_skew": supplier_volume_skew,
    "priority_share_shift": priority_share_shift,
}

ORACLES = {
    "orders_seasonal_index": ORDERS_SEASONAL_INDEX_SQL,
    "supplier_volume_skew": SUPPLIER_VOLUME_SKEW_SQL,
    "priority_share_shift": PRIORITY_SHARE_SHIFT_SQL,
}
