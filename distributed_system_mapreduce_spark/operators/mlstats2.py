"""Nonparametric statistics + link analysis, wave 12:

- mannwhitney_qty : Mann-Whitney U (rank-sum) test of l_quantity
                    between returned and kept lineitems, with the
                    exact tie-corrected normal approximation and the
                    rank-biserial effect size. The standard "did this
                    filter shift the distribution?" test a curation
                    pipeline runs between two cohorts at corpus scale.
- theil_sen_trend : Theil-Sen robust slope of monthly revenue —
                    median of all pairwise month-to-month slopes.
                    Robust twin of revenue_trend_ols (mlstats.py):
                    one outlier month moves OLS, not the pairwise
                    median.
- wilson_ci_rates : per-event-type high-value rate with the Wilson
                    95% score interval — the binomial CI that stays
                    inside [0,1] and behaves at small n, which is what
                    you want when some event type has 40 rows and
                    another has 40 million.
- hits_scores     : HITS hub/authority over the bipartite
                    customer->part purchase graph, two full power
                    iterations unrolled in EXACT integer space
                    (normalize once at the end), top-k per side.
                    Complements pagerank_parts (relational_ext4.py):
                    bipartite prestige vs random-walk centrality.

Exactness rules (the q1/source_hhi discipline):
- every cross-row sum is over BIGINTs or DECIMALs (exact,
  order-independent); doubles appear only in the final fixed-order
  scalar expressions, written as the SAME text for Spark and DuckDB;
- Mann-Whitney works on the bounded distinct-quantity grid (TPC-H
  quantities are 1..50), so 2*U and the tie sum are exact integer
  folds; sqrt is IEEE-correctly-rounded, so sigma/z hash-match;
- Theil-Sen slopes are doubles derived from DECIMAL-exact monthly
  revenue; the median comes from an explicit sorted-array pick, the
  same rule in both engines (no engine median() semantics involved);
- HITS iterates in integers: auth2(p) = sum of degrees of p's buyers,
  hub3(c) = sum of auth2 over c's parts — no per-round float
  normalization to drift.

Scale shape (100 TB): mannwhitney_qty is one partial agg onto a
<=50-row grid; theil_sen_trend aggregates onto a bounded calendar
grid before the pairwise join (months^2/2 pairs, constant);
wilson_ci_rates is a pure partial agg; hits_scores is two
shuffle-join+agg rounds over the edge table plus one broadcast 1-row
total. Driver state: zero everywhere.

Reference parity: extends the reference's aggregation surface
(maple_juice.go juice-phase reduce semantics) with the statistical
reducers its users run downstream; no reference file implements
these, so the semantics are defined by the cited literature (Mann &
Whitney 1947; Theil 1950/Sen 1968; Wilson 1927; Kleinberg 1999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut

# --------------------------------------------------------- mannwhitney_qty
# Group X = returned lineitems (l_returnflag = 'R'), group Y = the
# rest. 2U and the tie term are exact BIGINT folds over the <=50-row
# distinct-quantity grid; the final z / effect-size expressions are
# the same double text in both engines (shared list below).
_MW_SIGMA = (
    "sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)"
    " * (CAST(n1 + n2 + 1 AS DOUBLE)"
    " - CAST(tie_sum AS DOUBLE)"
    " / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))"
)
_MW_EXPRS = [
    "CAST(two_u AS DOUBLE) / 2.0 AS u_stat",
    "CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0 AS mu_u",
    f"{_MW_SIGMA} AS sigma_u",
    "(CAST(two_u AS DOUBLE) / 2.0"
    " - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)"
    f" / {_MW_SIGMA} AS z_score",
    "1.0 - CAST(two_u AS DOUBLE)"
    " / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rank_biserial",
]


def mannwhitney_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U on l_quantity, returned ('R') vs kept rows.

    U_X = sum_v nx(v) * (#Y below v + ny(v)/2) over the distinct
    quantity grid; computed as 2U (pure integer) to avoid the /2
    until the end. sigma uses the standard tie correction
    sigma^2 = n1 n2/12 * (N+1 - sum(t^3-t)/(N(N-1))); no continuity
    correction (documented — the oracle applies the identical rule).
    Plan: one partial agg lineitem -> <=50-row grid, a cumulative
    window over that bounded grid, one 1-row fold. Integer bounds:
    the 2U/tie folds accumulate in DECIMAL(38,0); the per-grid-row
    t^3 product stays BIGINT-exact up to ~2e6 rows per distinct
    quantity — beyond that, pre-scale t by a fixed divisor (the
    correction term is a ratio, so a common scale cancels).
    """
    li = load_table(spark, "lineitem", sf_dir)
    grid = (
        li.select(
            F.col("l_quantity").cast("long").alias("qty"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            .cast("long").alias("is_x"),
        )
        .groupBy("qty")
        .agg(
            F.sum("is_x").alias("nx"),
            F.sum(F.lit(1) - F.col("is_x")).alias("ny"),
        )
    )
    w = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, -1)
    grid = grid.withColumn(
        "ny_below", F.coalesce(F.sum("ny").over(w), F.lit(0).cast("long"))
    )
    folded = grid.agg(
        F.sum("nx").alias("n1"),
        F.sum("ny").alias("n2"),
        # DECIMAL(38,0) folds: exact and associative like BIGINT, but
        # 2U <= n1*n2 and sum(t^3) clear int64 at ~1e12 rows
        F.sum((F.col("nx") * (F.lit(2) * F.col("ny_below") + F.col("ny")))
              .cast("decimal(38,0)")).alias("two_u"),
        F.sum(
            ((F.col("nx") + F.col("ny")) * (F.col("nx") + F.col("ny"))
             * (F.col("nx") + F.col("ny")) - (F.col("nx") + F.col("ny")))
            .cast("decimal(38,0)")
        ).alias("tie_sum"),
    )
    return folded.selectExpr("n1", "n2", *_MW_EXPRS)


_MW_JOINED = ",\n  ".join(_MW_EXPRS)

MANNWHITNEY_QTY_SQL = f"""
WITH grid AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nx,
         SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS ny
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT qty, nx, ny,
         COALESCE(SUM(ny) OVER (ORDER BY qty
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS ny_below
  FROM grid
),
folded AS (
  SELECT CAST(SUM(nx) AS BIGINT) AS n1,
         CAST(SUM(ny) AS BIGINT) AS n2,
         CAST(SUM(nx * (2 * ny_below + ny)) AS DECIMAL(38,0)) AS two_u,
         CAST(SUM((nx + ny) * (nx + ny) * (nx + ny) - (nx + ny))
              AS DECIMAL(38,0)) AS tie_sum
  FROM cum
)
SELECT n1, n2,
  {_MW_JOINED}
FROM folded
"""


# --------------------------------------------------------- theil_sen_trend
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of monthly order revenue.

    Monthly revenue is a DECIMAL-exact rollup (the q1 discipline);
    months get the index year*12 + month-1. Every (m1 < m2) pair
    contributes slope (rev2-rev1)/(m2-m1); the estimate is the exact
    sorted-array median of those slopes (even count -> mean of the
    two middles, the identical rule written out in both engines).
    Shape: one partial agg onto the bounded calendar grid, a
    months^2/2 pair join of that grid with itself (constant size,
    independent of row volume), one bounded collect+fold.
    """
    orders = load_table(spark, "orders", sf_dir)
    monthly = (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long").alias("m")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
             .cast("double").alias("rev"))
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    pairs = a.join(b, F.col("a.m") < F.col("b.m")).select(
        ((F.col("b.rev") - F.col("a.rev"))
         / (F.col("b.m") - F.col("a.m")).cast("double")).alias("slope")
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.expr("sort_array(collect_list(slope))").alias("s"),
    ).selectExpr(
        "n_pairs",
        # floor() before the INT cast: Spark truncates float->int,
        # DuckDB rounds — floor makes the median indices engine-proof
        "(element_at(s, CAST(floor((n_pairs + 1) / 2.0) AS INT)) "
        " + element_at(s, CAST(floor((n_pairs + 2) / 2.0) AS INT))) / 2.0 "
        "AS sen_slope",
        "element_at(s, 1) AS min_slope",
        "element_at(s, CAST(n_pairs AS INT)) AS max_slope",
    )


THEIL_SEN_TREND_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT (b.rev - a.rev) / CAST(b.m - a.m AS DOUBLE) AS slope
  FROM monthly a JOIN monthly b ON a.m < b.m
),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         list_sort(list(slope)) AS s
  FROM pairs
)
SELECT n_pairs,
       (s[CAST(floor((n_pairs + 1) / 2.0) AS INT)]
        + s[CAST(floor((n_pairs + 2) / 2.0) AS INT)]) / 2.0 AS sen_slope,
       s[1] AS min_slope,
       s[CAST(n_pairs AS INT)] AS max_slope
FROM folded
"""


# --------------------------------------------------------- wilson_ci_rates
WILSON_Z = "1.96"  # 95% two-sided, literal in both engines
HIGH_VALUE = "100.0"

_W_CENTER = f"(p_hat + {WILSON_Z} * {WILSON_Z} / (2.0 * n_d)) / denom"
_W_HALF = (
    f"({WILSON_Z} / denom)"
    f" * sqrt(p_hat * (1.0 - p_hat) / n_d"
    f" + {WILSON_Z} * {WILSON_Z} / (4.0 * n_d * n_d))"
)
_WILSON_EXPRS = [
    f"{_W_CENTER} AS center",
    f"{_W_CENTER} - {_W_HALF} AS wilson_lo",
    f"{_W_CENTER} + {_W_HALF} AS wilson_hi",
]
_WILSON_JOINED = ",\n  ".join(_WILSON_EXPRS)


def wilson_ci_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type rate of high-value events (value > HIGH_VALUE)
    with the Wilson 95% score interval. One partial agg; the interval
    is a fixed-order double expression over two exact BIGINT counts,
    so it hash-matches (sqrt is correctly rounded). Wilson 1927."""
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("value") > float(HIGH_VALUE), 1).otherwise(0))
        .cast("long").alias("n_high"),
    )
    inter = counts.selectExpr(
        "event_type", "n_events", "n_high",
        "CAST(n_high AS DOUBLE) / CAST(n_events AS DOUBLE) AS p_hat",
        "CAST(n_events AS DOUBLE) AS n_d",
        f"1.0 + {WILSON_Z} * {WILSON_Z} / CAST(n_events AS DOUBLE) AS denom",
    )
    return inter.selectExpr(
        "event_type", "n_events", "n_high", "p_hat AS rate",
        *_WILSON_EXPRS,
    )


WILSON_CI_RATES_SQL = f"""
WITH counts AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN value > {HIGH_VALUE} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high
  FROM events GROUP BY event_type
),
inter AS (
  SELECT event_type, n_events, n_high,
         CAST(n_high AS DOUBLE) / CAST(n_events AS DOUBLE) AS p_hat,
         CAST(n_events AS DOUBLE) AS n_d,
         1.0 + {WILSON_Z} * {WILSON_Z} / CAST(n_events AS DOUBLE) AS denom
  FROM counts
)
SELECT event_type, n_events, n_high, p_hat AS rate,
  {_WILSON_JOINED}
FROM inter
"""


# -------------------------------------------------------------- hits_scores
HITS_TOPK = 15


def hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the bipartite customer->part
    purchase graph, two power iterations unrolled in EXACT integer
    space: hub1(c) = deg(c); auth2(p) = sum of hub1 over p's buyers;
    hub3(c) = sum of auth2 over c's parts. No per-round float
    normalization — each side is divided ONCE at the end by its exact
    BIGINT total, so scores are deterministic doubles. (BIGINT bound:
    auth2 <= E*max_deg, hub3 <= E*max_deg^2 — at 10^12 edges switch
    the final round to DECIMAL(38,0); the shape is unchanged.)
    Returns the top-HITS_TOPK of each side (ties -> smaller id).

    Shape at 100 TB: the edge list is one orders |><| lineitem shuffle
    join + distinct; each iteration is an edge-table join against a
    per-node aggregate (both sides shuffle on the node key, AQE-
    broadcastable when one side is small); totals are broadcast 1-row
    crossJoins; top-k is TakeOrderedAndProject. Driver state: zero.
    """
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # the edge table feeds all three propagation rounds — materialize
    # it once (the pagerank_parts checkpointed-edge discipline) so the
    # orders |><| lineitem shuffle join + distinct don't re-run per
    # round (measured 3.6s -> ~1.9s at sf0.1)
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_partkey").alias("p"),
        )
        .distinct()
        .transform(cut)
    )
    hub1 = edges.groupBy("c").agg(F.count("*").alias("h1"))
    # r10: auth2 feeds THREE subtrees (hub3's join, its own total,
    # the authority top-k) and hub3 feeds two — without a barrier
    # each consumer replayed the edge-join + partial agg (plan showed
    # the auth2 subtree 3x). One node-sized cut each; guide §2.4
    # (share one exchange) / §5 (cache only what is reused).
    auth2 = (
        edges.join(hub1, "c")
        .groupBy("p").agg(F.sum("h1").alias("a2"))
        .transform(cut)
    )
    hub3 = (
        edges.join(auth2, "p")
        .groupBy("c").agg(F.sum("a2").alias("h3"))
        .transform(cut)
    )
    a_tot = auth2.agg(F.sum("a2").alias("tot"))
    h_tot = hub3.agg(F.sum("h3").alias("tot"))
    top_auth = (
        auth2.crossJoin(F.broadcast(a_tot))
        .select(
            F.lit("authority").alias("side"),
            F.col("p").alias("node_id"),
            F.col("a2").alias("raw"),
            (F.col("a2").cast("double") / F.col("tot").cast("double"))
            .alias("score"),
        )
        .orderBy(F.desc("raw"), F.asc("node_id"))
        .limit(HITS_TOPK)
    )
    top_hub = (
        hub3.crossJoin(F.broadcast(h_tot))
        .select(
            F.lit("hub").alias("side"),
            F.col("c").alias("node_id"),
            F.col("h3").alias("raw"),
            (F.col("h3").cast("double") / F.col("tot").cast("double"))
            .alias("score"),
        )
        .orderBy(F.desc("raw"), F.asc("node_id"))
        .limit(HITS_TOPK)
    )
    return top_auth.unionByName(top_hub)


HITS_SCORES_SQL = f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
hub1 AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS h1 FROM edges GROUP BY c
),
auth2 AS (
  SELECT p, CAST(SUM(h1) AS BIGINT) AS a2
  FROM edges JOIN hub1 USING (c) GROUP BY p
),
hub3 AS (
  SELECT c, CAST(SUM(a2) AS BIGINT) AS h3
  FROM edges JOIN auth2 USING (p) GROUP BY c
),
a_tot AS (SELECT CAST(SUM(a2) AS BIGINT) AS tot FROM auth2),
h_tot AS (SELECT CAST(SUM(h3) AS BIGINT) AS tot FROM hub3),
top_auth AS (
  SELECT 'authority' AS side, p AS node_id, a2 AS raw,
         CAST(a2 AS DOUBLE) / CAST(tot AS DOUBLE) AS score
  FROM auth2, a_tot
  ORDER BY raw DESC, node_id ASC LIMIT {HITS_TOPK}
),
top_hub AS (
  SELECT 'hub' AS side, c AS node_id, h3 AS raw,
         CAST(h3 AS DOUBLE) / CAST(tot AS DOUBLE) AS score
  FROM hub3, h_tot
  ORDER BY raw DESC, node_id ASC LIMIT {HITS_TOPK}
)
SELECT * FROM top_auth UNION ALL SELECT * FROM top_hub
"""


QUERIES = {
    "mannwhitney_qty": mannwhitney_qty,
    "theil_sen_trend": theil_sen_trend,
    "wilson_ci_rates": wilson_ci_rates,
    "hits_scores": hits_scores,
}

ORACLES = {
    "mannwhitney_qty": MANNWHITNEY_QTY_SQL,
    "theil_sen_trend": THEIL_SEN_TREND_SQL,
    "wilson_ci_rates": WILSON_CI_RATES_SQL,
    "hits_scores": HITS_SCORES_SQL,
}
