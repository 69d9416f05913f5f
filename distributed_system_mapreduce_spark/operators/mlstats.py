"""ML-experiment statistics wave: cross-validation folds, exact-sum
OLS trend fits, and a chi-square independence test — the measurement
layer a training-data pipeline runs BEFORE committing to a mix
(does revenue actually trend? is activity independent of weekday?
are my CV folds balanced?).

Exactness discipline (the repo-wide rule): every aggregate is integer
/ DECIMAL-exact; doubles appear only in per-row fixed-order output
expressions or bounded ordered folds (user_survival_km idiom), so all
three queries value-hash against DuckDB.

Reference tie-in: each is a maple(map)->juice(reduce) pair in the
reference's model (/root/reference/maple_juice/maple_juice.go:376);
the fold-assignment hash mirrors its deterministic hash partitioner
(hash juice) applied to sample routing instead of key routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.operators.curation2 import (
    _hex16_expr,
)
from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut

N_FOLDS = 5
_DAY_US = 86_400_000_000


# ------------------------------------------------------------ kfold_assign
def kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment + per (source, fold)
    accounting: fold(doc) = hash16('fold:' || doc_id) % K — a pure
    function of doc_id (stable across runs/engines/partitioning, the
    train_val_split wall property), salted so it is independent of
    both the split wall and the mix-rebalance keep decision. Narrow
    map + one partial-agg shuffle to the bounded (source, fold)
    grid; balance is auditable from the output (each fold ~1/K of
    each source's docs AND tokens)."""
    docs = load_table(spark, "documents", sf_dir)
    fold = (
        F.expr(_hex16_expr("'fold:' || CAST(doc_id AS STRING)"))
        .cast("long") % N_FOLDS
    )
    return (
        docs.select("source", fold.alias("fold"),
                    X.n_tokens().cast("long").alias("n_toks"))
        .groupBy("source", "fold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_toks").cast("long").alias("total_tokens"))
    )


KFOLD_ASSIGN_SQL = f"""
SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens
FROM (
  SELECT source,
         CAST({_hex16_expr("'fold:' || CAST(doc_id AS VARCHAR)")}
              AS BIGINT) % {N_FOLDS} AS fold,
         {X.N_TOKENS_SQL} AS n_toks
  FROM documents
)
GROUP BY source, fold
"""


# -------------------------------------------------------- revenue_trend_ols
def revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS fit of monthly revenue vs month index — slope
    (dollars/month) and intercept, the 'is this market actually
    growing' readout that events_holt_forecast (smoothing) and
    discount_qty_elasticity (grouped means) do not answer.

    Exactness for a regression: revenue is accumulated as exact
    integer ten-thousandths (extprice and discount each carry 2
    decimals, so the per-row product has exactly 4), every OLS moment
    (n, Sx, Sxx, Sy, Sxy) is an exact BIGINT, and the normal-equation
    numerator/denominator are exact BIGINT combinations; at gate SFs
    all stay under 2^53, so the final cast-to-double + divide is the
    identical IEEE sequence on both engines. Shape: two partial-agg
    shuffles (lineitem->month grid, grid->nation) with the customer/
    nation dims broadcast; the month grid is bounded (~84 rows per
    nation)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")))
        .alias("rev"))
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    x = ((F.year("o_orderdate") - F.lit(1992)) * 12
         + F.month("o_orderdate") - F.lit(1)).cast("long")
    monthly = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", x.alias("x"))
        .agg((F.sum("rev") * 10000).cast("decimal(38,0)").cast("long")
             .alias("y"))
    )
    m = (
        monthly.groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("x").cast("long").alias("sx"),
             F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
             F.sum("y").cast("long").alias("sy"),
             F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"))
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope = num.cast("double") / den.cast("double") / F.lit(10000.0)
    return m.filter(den > 0).select(
        F.col("n_name").alias("nation"),
        F.col("n").alias("n_months"),
        slope.alias("slope"),
        ((F.col("sy").cast("double") / F.lit(10000.0)
          - slope * F.col("sx").cast("double"))
         / F.col("n").cast("double")).alias("intercept"),
    )


REVENUE_TREND_OLS_SQL = """
WITH monthly AS (
  SELECT n_name,
         (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS x,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2))))
                   AS DECIMAL(38,4)) * 10000 AS BIGINT) AS y
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, x
),
m AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM monthly GROUP BY n_name
)
SELECT n_name AS nation, n AS n_months,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) / 10000.0 AS slope,
       (CAST(sy AS DOUBLE) / 10000.0
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / 10000.0)
          * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM m
WHERE n * sxx - sx * sx > 0
"""


# --------------------------------------------------------- events_chi2_dow
def events_chi2_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type vs day-of-week:
    per-type contribution to the chi2 statistic over the bounded
    (type x 7) contingency grid, with the shared degrees of freedom —
    'does activity mix shift by weekday' as an exact test statistic
    rather than an eyeballed heatmap (events_hour_heatmap's
    inferential sibling; ab_test_zstat's multi-category one).

    dow is epoch-day % 7 (pure integer, identical cross-engine — no
    locale-dependent weekday functions). Observed counts, row and
    column totals are exact BIGINTs; each cell's expected value r*c/N
    and contribution (o-e)^2/e are per-cell fixed-order double
    expressions; the per-type sum folds its <= 7 cells in dow order
    (user_survival_km discipline). One partial-agg shuffle to the
    grid — localCheckpointed: row/column/grand totals and the cell
    join all reference it, and each replayed the events scan
    otherwise (r7 scan audit: 4 scans, now 1); totals ride broadcast
    joins."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}") % 7)
        .alias("dow"))
    grid = (
        ev.groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .transform(cut)
    )
    rows = grid.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("r"))
    cols = F.broadcast(grid.groupBy("dow").agg(
        F.sum("o").cast("long").alias("c")))
    tot = F.broadcast(grid.agg(
        F.sum("o").cast("long").alias("n_total"),
        F.countDistinct("event_type").cast("long").alias("n_types")))
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n_total")
    contrib = (F.col("o").cast("double") - e) * (
        F.col("o").cast("double") - e) / e
    cells = (
        grid.join(rows, "event_type").join(cols, "dow").crossJoin(tot)
        .select("event_type", "dow", "r", "n_types",
                contrib.alias("contrib"))
    )
    return (
        cells.groupBy("event_type")
        .agg(
            F.min("r").alias("n_events"),
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(dow, contrib))), e -> e.contrib), "
                "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("chi2_contrib"),
            ((F.min("n_types") - 1) * 6).alias("dof"),
        )
    )


EVENTS_CHI2_DOW_SQL = f"""
WITH ev AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // {_DAY_US}) % 7 AS dow
  FROM events
),
grid AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM ev GROUP BY event_type, dow
),
r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r
      FROM grid GROUP BY event_type),
c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM grid GROUP BY dow),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM grid),
cells AS (
  SELECT g.event_type, g.dow, r.r, tot.n_types,
         (CAST(g.o AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / n_total)
         * (CAST(g.o AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / n_total)
         / (CAST(r.r * c.c AS DOUBLE) / n_total) AS contrib
  FROM grid g JOIN r USING (event_type) JOIN c USING (dow)
  CROSS JOIN tot
)
SELECT event_type, MIN(r) AS n_events,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY dow)),
         (acc, x) -> acc + x) AS chi2_contrib,
       (MIN(n_types) - 1) * 6 AS dof
FROM cells
GROUP BY event_type
"""




# --------------------------------------------------------------- bootstrap_ci
N_BOOT = 32
# Poisson(1) inverse-CDF thresholds on the 16-bit hash grid:
# floor(65536 * P(X <= k)) for k = 0..4; >= the last -> weight 5.
_POIS_T = (24109, 48218, 60273, 64291, 65296)


def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for each event type's
    mean daily value-sum — the at-scale bootstrap (each unit gets an
    independent Poisson(1) resample weight, so resampling is one
    narrow map instead of a shuffle per resample; the production A/B
    measurement idiom) made fully deterministic: weights come from
    the salted 16-bit md5 grid through a fixed Poisson(1)
    inverse-CDF table, so both engines draw the SAME 32 resamples.

    Exactness: daily sums are integer micro-units; per-resample
    weighted sums are exact BIGINTs (weights <= 5); each resample
    mean is one fixed-order double division; the 2.5%/97.5% band is
    the exact interpolating percentile over the 32 means. Shape: one
    partial-agg shuffle to the (type, day) grid, a bounded x32
    explode ON the grid (never on raw events), a second partial agg
    to (type, resample), then a 32-element percentile per type."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}")
        .alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"))
    daily = (
        ev.groupBy("event_type", "day")
        .agg((F.sum("v") * 1000000).cast("decimal(38,0)").cast("long")
             .alias("x"))
    )
    w_case = (
        "CASE "
        + " ".join(
            f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T))
        + " ELSE 5 END"
    )
    boot = (
        daily.select(
            "event_type", "day", "x",
            F.explode(F.expr(
                f"sequence(0, {N_BOOT - 1})")).alias("b"))
        .withColumn("h", F.expr(_hex16_expr(
            "'bs:' || CAST(b AS STRING) || ':' || CAST(day AS STRING)"))
            .cast("long"))
        .select("event_type", "b", "x",
                F.expr(w_case).cast("long").alias("w"))
        .groupBy("event_type", "b")
        .agg(F.sum(F.col("w") * F.col("x")).cast("long").alias("swx"),
             F.sum("w").cast("long").alias("sw"))
        .filter(F.col("sw") > 0)
        .select("event_type",
                (F.col("swx").cast("double") / F.col("sw").cast("double")
                 / F.lit(1e6)).alias("m"))
    )
    full = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.sum("x").cast("double") / F.count(F.lit(1)).cast("double")
         / F.lit(1e6)).alias("mean_daily"))
    ci = boot.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.expr("percentile(m, array(0.025, 0.975))").alias("qs"))
    return (
        full.join(ci, "event_type")
        .select("event_type", "n_days", "mean_daily",
                F.col("qs")[0].alias("ci_lo"),
                F.col("qs")[1].alias("ci_hi"),
                "n_resamples")
    )


_W_CASE_SQL = ("CASE "
               + " ".join(f"WHEN h < {t} THEN {k}"
                          for k, t in enumerate(_POIS_T))
               + " ELSE 5 END")

BOOTSTRAP_CI_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // {_DAY_US} AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))
              * 1000000 AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
boot AS (
  SELECT event_type, b,
         CAST(SUM(w * x) AS BIGINT) AS swx,
         CAST(SUM(w) AS BIGINT) AS sw
  FROM (
    SELECT event_type, b, x, {_W_CASE_SQL} AS w
    FROM (
      SELECT event_type, day, x, b,
             CAST({_hex16_expr(
                 "'bs:' || CAST(b AS VARCHAR) || ':' || CAST(day AS VARCHAR)")}
                  AS BIGINT) AS h
      FROM daily, unnest(range(0, {N_BOOT})) AS t(b)
    )
  )
  GROUP BY event_type, b
),
means AS (
  SELECT event_type,
         CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) / 1e6 AS m
  FROM boot WHERE sw > 0
),
fl AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
           AS mean_daily
  FROM daily GROUP BY event_type
),
ci AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_resamples,
         quantile_cont(m, [0.025, 0.975]) AS qs
  FROM means GROUP BY event_type
)
SELECT f.event_type, f.n_days, f.mean_daily,
       qs[1] AS ci_lo, qs[2] AS ci_hi, n_resamples
FROM fl f JOIN ci USING (event_type)
"""



# ---------------------------------------------------------- seasonal_strength
def seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality strength per event type: eta² = the share of
    daily-volume variance explained by day-of-week (SS_between /
    SS_total) — one number that says whether a weekly-seasonal model
    (events_dow_profile, events_holt_forecast) is worth fitting at
    all. eta² near 0: no weekly rhythm; near 1: volume is pure
    calendar.

    Determinism: every moment (daily counts, per-dow sums/counts,
    corpus sums of squares) is an exact BIGINT < 2^53, so the casts
    are exact; eta² assembles as ONE fixed-order double expression
    whose only iteration is a dow-ordered 7-element fold (the
    user_survival_km discipline). Shape: two bounded partial-agg
    shuffles (day grid, dow grid)."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}")
        .alias("day"))
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("dow", F.col("day") % 7)
    )
    per = (
        daily.groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("long").alias("dw"),
             F.sum("c").cast("long").alias("sw"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"))
    ssb_part = (
        "aggregate(transform(array_sort(collect_list(struct(dow, dw, sw)))"
        ", e -> CAST(e.sw AS DOUBLE) * CAST(e.sw AS DOUBLE)"
        " / CAST(e.dw AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    return (
        per.groupBy("event_type")
        .agg(F.expr(ssb_part).alias("sb"))
        .join(tot, "event_type")
        .select(
            "event_type", F.col("d").alias("n_days"),
            ((F.col("d").cast("double") * F.col("sb")
              - F.col("s").cast("double") * F.col("s").cast("double"))
             / (F.col("d").cast("double") * F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")))
            .alias("eta2"),
        )
    )


SEASONAL_STRENGTH_SQL = f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
withdow AS (SELECT event_type, day % 7 AS dow, c FROM daily),
per AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS dw,
         CAST(SUM(c) AS BIGINT) AS sw
  FROM withdow GROUP BY event_type, dow
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM withdow GROUP BY event_type
),
sb AS (
  SELECT event_type,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                  / CAST(dw AS DOUBLE) ORDER BY dow)),
           (acc, x) -> acc + x) AS sb
  FROM per GROUP BY event_type
)
SELECT t.event_type, d AS n_days,
       (CAST(d AS DOUBLE) * sb
        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         / (CAST(d AS DOUBLE) * CAST(q AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) AS eta2
FROM tot t JOIN sb USING (event_type)
"""

QUERIES = {
    "kfold_assign": kfold_assign,
    "revenue_trend_ols": revenue_trend_ols,
    "events_chi2_dow": events_chi2_dow,
    "bootstrap_ci": bootstrap_ci,
    "seasonal_strength": seasonal_strength,
}

ORACLES = {
    "kfold_assign": KFOLD_ASSIGN_SQL,
    "revenue_trend_ols": REVENUE_TREND_OLS_SQL,
    "events_chi2_dow": EVENTS_CHI2_DOW_SQL,
    "bootstrap_ci": BOOTSTRAP_CI_SQL,
    "seasonal_strength": SEASONAL_STRENGTH_SQL,
}
