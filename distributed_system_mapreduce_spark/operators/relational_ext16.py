"""Governance and audit statistics, wave 16:

- t_closeness       : the third rung of the privacy-audit ladder
                      (k_anonymity -> l_diversity -> t-closeness):
                      per release cell, the total-variation distance
                      between the cell's sensitive-attribute
                      distribution and the type's global one.
- events_changepoint: single changepoint per event type over the
                      daily-count series (binary-segmentation step:
                      the split day maximizing the two-segment SSE
                      reduction) — the "when did behavior change"
                      audit complementing events_cusum's drift alarm.
- benford_audit     : first-digit (Benford's-law) census of order
                      totals per priority with chi-square deviation —
                      the classic fabricated-numbers screen.

Exactness: t_closeness and events_changepoint are pure integer
counts/sums combined in fixed-order rational arithmetic (no
transcendentals at all — the changepoint gain uses the
S_l^2/n_l + S_r^2/n_r - S^2/n identity, so no per-day mean
subtraction); benford_audit's expected shares are PYTHON-GENERATED
literal doubles baked identically into both engines' SQL, so every
value is bit-identical cross-engine without ln_det.

Scale shape (100 TB): everything aggregates to bounded grids first
((type, day) cells x value buckets; (type, day) daily counts;
(priority, digit) census). Windows partition by event_type over the
CALENDAR-bounded day grid; every join against a global/total side is
a broadcast of a bounded aggregate; driver state zero.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table

# sensitive-attribute bucketing shared with l_diversity (ext9)
_VBUCKET = "CAST(floor(value / 50.0) AS BIGINT)"
T_CLOSE = 0.35  # cells whose TVD to the global distribution exceeds
# this leak attribute skew even when k-anonymous and l-diverse


# ----------------------------------------------------------- t_closeness
def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (event_type, day) release cells the
    k_anonymity / l_diversity queries already score: TVD(cell, global)
    = 0.5 * sum_s |c_s / n_cell - g_s / n_type| over the sensitive
    value buckets s. Per type: worst cell TVD, cells above T_CLOSE,
    and the share of observations in those cells.

    Shape: ONE events scan and ONE wide shuffle — the partial agg to
    (type, day, sens) counts (r7: the previous shape scanned events
    4x, once per margin, then zero-filled a cell x bucket grid; at
    100 TB the margins are free, the scans are not). The zero-fill
    grid is unnecessary: a bucket ABSENT from a cell contributes
    g/N to the TVD sum, and those absent contributions total
    1 - sum_present(g/N), so TVD = 0.5 * (1 + sum_present(|c/n - g/N|
    - g/N)) over only the buckets the cell actually has. All three
    margins become window sums over the bounded cell table (calendar
    x value-range/50 rows, never the raw events). The per-cell fold
    runs over the SORTED bounded term list (a plain SUM of doubles
    would be order-dependent in the last ulp), like every other
    double-sum oracle in this repo."""
    ev = load_table(spark, "events", sf_dir)
    obs = ev.select(
        "event_type", F.to_date("ts").alias("day"),
        F.expr(_VBUCKET).alias("sens"),
    )
    cell_s = obs.groupBy("event_type", "day", "sens").agg(
        F.count("*").alias("c"))
    enr = cell_s.select(
        "event_type", "day", "c",
        F.expr("sum(c) OVER (PARTITION BY event_type, day)")
        .alias("n_cell"),
        F.expr("sum(c) OVER (PARTITION BY event_type, sens)")
        .alias("g"),
        F.expr("sum(c) OVER (PARTITION BY event_type)").alias("n_type"),
    ).withColumn(
        "term",
        F.expr("abs(CAST(c AS DOUBLE) / n_cell "
               "- CAST(g AS DOUBLE) / n_type) "
               "- CAST(g AS DOUBLE) / n_type"),
    )
    tvd = enr.groupBy("event_type", "day").agg(
        F.first("n_cell").alias("n_obs"),
        ((F.expr("aggregate(sort_array(collect_list(term)), "
                 "CAST(0 AS DOUBLE), (acc, t) -> acc + t)") + F.lit(1.0))
         * 0.5).alias("tvd"),
    )
    weak = F.col("tvd") > T_CLOSE
    return (
        tvd.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.max("tvd").alias("max_tvd"),
            F.sum(weak.cast("long")).cast("long").alias("n_weak_cells"),
            F.sum(F.when(weak, F.col("n_obs")).otherwise(0))
            .cast("long").alias("obs_at_risk"),
            F.sum("n_obs").cast("long").alias("n_obs"),
        )
        .select(
            "event_type", "n_cells", "max_tvd", "n_weak_cells",
            "obs_at_risk", "n_obs",
            (F.col("obs_at_risk").cast("double")
             / F.col("n_obs").cast("double")).alias("risk_share"),
        )
    )


T_CLOSENESS_SQL = f"""
WITH obs AS (
  SELECT event_type, CAST(ts AS DATE) AS day, {_VBUCKET} AS sens
  FROM events
),
cell_s AS (SELECT event_type, day, sens, COUNT(*) AS c
           FROM obs GROUP BY event_type, day, sens),
enr AS (
  SELECT event_type, day, c,
         SUM(c) OVER (PARTITION BY event_type, day) AS n_cell,
         SUM(c) OVER (PARTITION BY event_type, sens) AS g,
         SUM(c) OVER (PARTITION BY event_type) AS n_type
  FROM cell_s
),
terms AS (
  SELECT event_type, day, n_cell,
         abs(CAST(c AS DOUBLE) / n_cell
             - CAST(g AS DOUBLE) / n_type)
           - CAST(g AS DOUBLE) / n_type AS term
  FROM enr
),
tvd AS (
  SELECT event_type, day, ANY_VALUE(n_cell) AS n_obs,
         (list_reduce(list_sort(list(term)), (acc, t) -> acc + t)
          + 1.0) * 0.5 AS tvd
  FROM terms GROUP BY event_type, day
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       MAX(tvd) AS max_tvd,
       CAST(SUM(CASE WHEN tvd > {T_CLOSE} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weak_cells,
       CAST(SUM(CASE WHEN tvd > {T_CLOSE} THEN n_obs ELSE 0 END)
            AS BIGINT) AS obs_at_risk,
       CAST(SUM(n_obs) AS BIGINT) AS n_obs,
       CAST(SUM(CASE WHEN tvd > {T_CLOSE} THEN n_obs ELSE 0 END)
            AS DOUBLE) / CAST(SUM(n_obs) AS DOUBLE) AS risk_share
FROM tvd GROUP BY event_type
"""


# ----------------------------------------------------- events_changepoint
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best changepoint per event type over the daily-count
    series: the split day t maximizing the between-segment SSE
    reduction gain(t) = S_l^2/n_l + S_r^2/n_r - S^2/n (days 1..t in
    the left segment) — the first step of binary segmentation, and
    the answer to "WHEN did this metric shift" after events_cusum
    says "it shifted".

    Shape: one partial agg to the calendar-bounded (type, day) daily
    counts; prefix sums via a window PARTITIONED BY TYPE over that
    bounded day grid (never the raw stream); totals broadcast back;
    the argmax is one min(struct) partial agg with day tie-break.
    Gains are exact-integer rationals evaluated in one fixed
    expression — no mean subtraction, no transcendentals."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.select("event_type", F.to_date("ts").alias("day"))
             .groupBy("event_type", "day").agg(F.count("*").alias("y")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = daily.select(
        "event_type", "day",
        F.sum("y").over(w).alias("sl"),
        F.count("*").over(w).alias("nl"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("y").alias("s"), F.count("*").alias("n"))
    gain = (
        pre.join(F.broadcast(tot), "event_type")
        .where(F.col("nl") < F.col("n"))  # a split needs a right side
        .withColumn(
            "gain",
            F.expr("CAST(sl AS DOUBLE) * sl / nl "
                   "+ CAST(s - sl AS DOUBLE) * (s - sl) / (n - nl) "
                   "- CAST(s AS DOUBLE) * s / n"),
        )
    )
    return (
        gain.groupBy("event_type")
        .agg(F.min(F.struct(
            (-F.col("gain")).alias("ng"),
            F.col("day").alias("d"),
            F.col("sl").alias("psl"), F.col("nl").alias("pnl"),
            F.col("s").alias("ps"), F.col("n").alias("pn"),
        )).alias("t"))
        .select(
            "event_type",
            F.col("t.d").alias("split_day"),
            (-F.col("t.ng")).alias("gain"),
            (F.col("t.psl").cast("double") / F.col("t.pnl"))
            .alias("mean_before"),
            ((F.col("t.ps") - F.col("t.psl")).cast("double")
             / (F.col("t.pn") - F.col("t.pnl"))).alias("mean_after"),
        )
    )


EVENTS_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pre AS (
  SELECT event_type, day,
         SUM(y) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS sl,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS nl
  FROM daily
),
tot AS (SELECT event_type, SUM(y) AS s, COUNT(*) AS n
        FROM daily GROUP BY event_type),
gain AS (
  SELECT pre.event_type, day, sl, nl, s, n,
         CAST(sl AS DOUBLE) * sl / nl
           + CAST(s - sl AS DOUBLE) * (s - sl) / (n - nl)
           - CAST(s AS DOUBLE) * s / n AS gain
  FROM pre JOIN tot ON pre.event_type = tot.event_type
  WHERE nl < n
),
best AS (
  SELECT event_type, day, gain, sl, nl, s, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY gain DESC, day ASC) AS rn
  FROM gain
)
SELECT event_type, day AS split_day, gain,
       CAST(sl AS DOUBLE) / nl AS mean_before,
       CAST(s - sl AS DOUBLE) / (n - nl) AS mean_after
FROM best WHERE rn = 1
"""


# ---------------------------------------------------------- benford_audit
# Expected first-digit shares log10(1 + 1/d): Python-generated ONCE and
# baked as identical literals into both engines' expressions — no
# runtime transcendentals, so no cross-engine drift is possible.
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}
_P_CASE = ("CASE " + " ".join(
    # CAST: both engines parse a bare decimal literal as DECIMAL, and
    # DECIMAL*BIGINT rounds differently per engine — force DOUBLE so
    # every downstream op is plain IEEE arithmetic
    f"WHEN digit = {d} THEN CAST({p} AS DOUBLE)"
    for d, p in _BENFORD_P.items()
) + " END")
# First digit of the INTEGER part: floor first (DuckDB CAST rounds
# half-even, Spark truncates — floor makes both exact), then take the
# leading character of the decimal rendering of an exact BIGINT.
_DIGIT = ("CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) "
          "AS STRING), 1, 1) AS INT)")
_DIGIT_SQL = ("CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) "
              "AS VARCHAR), 1, 1) AS INT)")


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals per priority class: for
    each (o_orderpriority, leading digit) — observed count, observed
    share, the Benford expectation, and the chi-square contribution
    (n - N p)^2 / (N p). Fabricated or clamped totals light up as a
    fat chi2 on digits 1/9. Totals span ~3 decades here, the regime
    where Benford applies.

    Shape: one partial agg onto the bounded (priority, digit) grid,
    per-priority totals via a second bounded agg broadcast back. The
    expectations are literal constants; every double is one
    fixed-order expression over exact integers."""
    orders = load_table(spark, "orders", sf_dir)
    census = (orders.select(
        "o_orderpriority", F.expr(_DIGIT).alias("digit"))
        .groupBy("o_orderpriority", "digit")
        .agg(F.count("*").alias("n_obs")))
    tot = census.groupBy("o_orderpriority").agg(
        F.sum("n_obs").alias("n_tot"))
    return (
        census.join(F.broadcast(tot), "o_orderpriority")
        .withColumn("benford_p", F.expr(_P_CASE))
        .select(
            "o_orderpriority", "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            (F.col("n_obs").cast("double") / F.col("n_tot"))
            .alias("share"),
            "benford_p",
            F.expr("CAST(n_obs - n_tot * benford_p AS DOUBLE) "
                   "* (n_obs - n_tot * benford_p) "
                   "/ (n_tot * benford_p)").alias("chi2_term"),
        )
    )


BENFORD_AUDIT_SQL = f"""
WITH census AS (
  SELECT o_orderpriority, {_DIGIT_SQL} AS digit, COUNT(*) AS n_obs
  FROM orders GROUP BY o_orderpriority, {_DIGIT_SQL}
),
tot AS (SELECT o_orderpriority, SUM(n_obs) AS n_tot
        FROM census GROUP BY o_orderpriority)
SELECT census.o_orderpriority, digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST(n_obs AS DOUBLE) / n_tot AS share,
       {_P_CASE} AS benford_p,
       CAST(n_obs - n_tot * ({_P_CASE}) AS DOUBLE)
         * (n_obs - n_tot * ({_P_CASE}))
         / (n_tot * ({_P_CASE})) AS chi2_term
FROM census JOIN tot ON census.o_orderpriority = tot.o_orderpriority
"""


QUERIES = {
    "t_closeness": t_closeness,
    "events_changepoint": events_changepoint,
    "benford_audit": benford_audit,
}

ORACLES = {
    "t_closeness": T_CLOSENESS_SQL,
    "events_changepoint": EVENTS_CHANGEPOINT_SQL,
    "benford_audit": BENFORD_AUDIT_SQL,
}
