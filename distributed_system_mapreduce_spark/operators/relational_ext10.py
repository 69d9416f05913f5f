"""Relational wave 13: session-shape and mix-drift census queries.

- session_lengths  : global histogram of session sizes under the
                     30-minute-gap sessionization — the engagement
                     distribution behind the per-user session counts.
- returns_mix_shift: year-over-year total-variation distance of the
                     (returnflag, linestatus) mix — category-drift
                     monitoring on the relational side (events_drift
                     is the event-stream twin).

Reference parity: SURVEY §2.C extensions (maple+juice pairs in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut

SESSION_GAP_MIN = 30


# ------------------------------------------------------- session_lengths
def session_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How big are sessions? Events sessionize per user on a
    30-minute inactivity gap (the events_sessionize rule); this
    reports the GLOBAL histogram of events-per-session — the
    engagement-depth distribution product analytics tracks.

    Shape: the gap flags and session ids are per-user windows
    (bounded partitions, single exchange), the histogram is one
    partial-agg shuffle on the bounded length key. All integers."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us, 1).over(w)
    newsess = (gap.isNull()
               | (gap > SESSION_GAP_MIN * 60 * 1_000_000)).cast("long")
    sess = (
        ev.withColumn("new_s", newsess)
        .withColumn(
            "sess_id",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("length"))
    )
    return (
        sess.groupBy("length")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .select(F.col("length").cast("long").alias("length"),
                "n_sessions")
    )


SESSION_LENGTHS_SQL = f"""
WITH flagged AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))
              > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_s,
         ts, event_id
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
lens AS (
  SELECT user_id, sess_id, COUNT(*) AS length
  FROM sess GROUP BY user_id, sess_id
)
SELECT CAST(length AS BIGINT) AS length,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM lens GROUP BY length
"""


# ----------------------------------------------------- returns_mix_shift
def returns_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-mix drift on the fact table: per ship year, the
    total-variation distance between this year's and the previous
    year's (returnflag, linestatus) distribution — the relational
    twin of events_drift's first-vs-second-half monitor, reported as
    a year-over-year series.

    Exactness: TVD accumulates 0.5·Σ|c_cur·N_prev − c_prev·N_cur| in
    exact DECIMAL integer arithmetic with ONE double division per
    year (the events_drift discipline). Shape: one partial-agg
    shuffle to the bounded (year, flag, status) table —
    localCheckpointed, since the lag self-join references it twice
    and the year totals a third time, each replaying the lineitem
    scan otherwise (r7 scan audit: 4 scans, now 1); the lag
    alignment is a broadcast self-join on that bounded table. A
    category absent in one year still contributes — the full outer
    join keeps both sides' categories with zero fills."""
    li = load_table(spark, "lineitem", sf_dir)
    yc = (
        li.groupBy(
            F.year("l_shipdate").alias("yr"),
            "l_returnflag", "l_linestatus",
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(cut)
    )
    cur = yc.select("yr", "l_returnflag", "l_linestatus",
                    F.col("c").alias("c_cur"))
    prv = yc.select((F.col("yr") + 1).alias("yr"), "l_returnflag",
                    "l_linestatus", F.col("c").alias("c_prev"))
    both = (
        cur.join(F.broadcast(prv),
                 ["yr", "l_returnflag", "l_linestatus"], "full")
        .fillna({"c_cur": 0, "c_prev": 0})
    )
    tot = both.groupBy("yr").agg(
        F.sum("c_cur").cast("long").alias("n_cur"),
        F.sum("c_prev").cast("long").alias("n_prev"))
    return (
        both.join(F.broadcast(tot), "yr")
        .filter((F.col("n_cur") > 0) & (F.col("n_prev") > 0))
        .groupBy("yr")
        .agg(
            F.min("n_cur").alias("n_lines"),
            F.min("n_prev").alias("n_lines_prev"),
            (F.sum(F.abs(
                F.col("c_cur").cast("decimal(38,0)") * F.col("n_prev")
                - F.col("c_prev").cast("decimal(38,0)") * F.col("n_cur")
            )).cast("double")
             / (F.lit(2.0) * F.min("n_cur").cast("double")
                * F.min("n_prev").cast("double"))).alias("tvd"),
        )
    )


RETURNS_MIX_SHIFT_SQL = """
WITH yc AS (
  SELECT year(l_shipdate) AS yr, l_returnflag, l_linestatus,
         COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2, 3
),
mixed AS (
  SELECT COALESCE(cur.yr, prv.yr) AS yr,
         COALESCE(cur.c, 0) AS c_cur,
         COALESCE(prv.c, 0) AS c_prev
  FROM yc cur
  FULL JOIN (SELECT yr + 1 AS yr, l_returnflag, l_linestatus, c
             FROM yc) prv
    ON cur.yr = prv.yr AND cur.l_returnflag = prv.l_returnflag
       AND cur.l_linestatus = prv.l_linestatus
),
tot AS (
  SELECT yr, CAST(SUM(c_cur) AS BIGINT) AS n_cur,
         CAST(SUM(c_prev) AS BIGINT) AS n_prev
  FROM mixed GROUP BY yr
)
SELECT b.yr, MIN(n_cur) AS n_lines, MIN(n_prev) AS n_lines_prev,
       CAST(SUM(abs(CAST(c_cur AS DECIMAL(38,0)) * n_prev
                    - CAST(c_prev AS DECIMAL(38,0)) * n_cur))
            AS DOUBLE)
         / (2.0 * CAST(MIN(n_cur) AS DOUBLE)
            * CAST(MIN(n_prev) AS DOUBLE)) AS tvd
FROM mixed b JOIN tot ON b.yr = tot.yr
WHERE n_cur > 0 AND n_prev > 0
GROUP BY b.yr
"""


# ------------------------------------------------------ user_survival_km
_DAY_US = 86_400_000_000


def user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-error: each user
    enters at their first event, 'fails' at their first error at or
    after it, and is right-censored at the end of observation
    otherwise; S(t) = Π_{s<=t} (1 - d_s/n_s) over failure days — the
    retention/reliability estimator that handles censoring correctly
    where a naive failure-rate curve does not.

    Exactness for an estimator that is a PRODUCT of ratios: factor
    (n_s - d_s)/n_s is one exact-integer division; S(t) folds the
    factors in day order with a strict left fold from 1.0 — Spark
    aggregate() and DuckDB list_reduce produce the identical IEEE
    sequence, so the curve value-hashes cross-engine (the
    functions/vectors discipline applied to time instead of dims).
    Shape: one per-user partial-agg shuffle; everything after lives
    on the BOUNDED day grid (triangular broadcast joins — the
    split_ks_check discipline; never a global window over users).
    The day grid is localCheckpointed: every downstream branch
    (at-risk, steps, the final fold) references it, and without the
    barrier Catalyst replays the per-user subtree — and its events
    scan — under each reference (r7 scan audit measured 12 scans in
    the static plan; it is 2 with the barrier: the endcap max and
    the per-user agg). n_users is derived from the grid itself
    (every user lands on exactly one day row, so sum(d + c) counts
    users exactly) instead of re-aggregating per_user."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    endcap = F.broadcast(ev.agg(F.max("us").alias("end_us")))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min("us").alias("start_us"),
            F.min(F.when(F.col("event_type") == "error",
                         F.col("us"))).alias("err_us"),
        )
        .crossJoin(endcap)
        .select(
            F.expr(
                f"CASE WHEN err_us IS NOT NULL THEN "
                f"(err_us - start_us) DIV {_DAY_US} END").alias("ed"),
            F.expr(f"(end_us - start_us) DIV {_DAY_US}").alias("cd"),
        )
    )
    days = (
        per_user.select(
            F.coalesce("ed", "cd").alias("t"),
            F.col("ed").isNotNull().cast("long").alias("is_event"),
        )
        .groupBy("t")
        .agg(
            F.sum("is_event").cast("long").alias("d"),
            F.sum(1 - F.col("is_event")).cast("long").alias("c"),
        )
        .transform(cut)
    )
    n_total = F.broadcast(days.agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_users")))
    b = F.broadcast(days.select(F.col("t").alias("s"),
                                F.col("d").alias("ds"),
                                F.col("c").alias("cs")))
    # at-risk at t: everyone not failed/censored strictly before t
    atrisk = (
        days.join(b, F.col("s") < F.col("t"), "left")
        .groupBy("t", "d", "c")
        .agg(F.coalesce(F.sum(F.col("ds") + F.col("cs")), F.lit(0))
             .cast("long").alias("gone"))
        .crossJoin(n_total)
        .select(
            "t", "d", "c",
            (F.col("n_users") - F.col("gone")).alias("n_risk"),
        )
    )
    steps = F.broadcast(
        atrisk.filter(F.col("d") > 0).select(
            F.col("t").alias("s"),
            ((F.col("n_risk") - F.col("d")).cast("double")
             / F.col("n_risk").cast("double")).alias("factor"),
        )
    )
    return (
        atrisk.filter(F.col("d") > 0)
        .join(steps, F.col("s") <= F.col("t"))
        .groupBy("t", "d", "c", "n_risk")
        .agg(F.expr(
            "aggregate(transform(array_sort(collect_list("
            "struct(s, factor))), e -> e.factor), "
            "CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)"
        ).alias("survival"))
        .select(
            F.col("t").alias("day"),
            F.col("n_risk").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            "survival",
        )
    )


USER_SURVIVAL_KM_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
endcap AS (SELECT MAX(us) AS end_us FROM ev),
per_user AS (
  SELECT CASE WHEN err_us IS NOT NULL THEN
           CAST(CAST(err_us - start_us AS HUGEINT) // {_DAY_US}
                AS BIGINT) END AS ed,
         CAST(CAST(end_us - start_us AS HUGEINT) // {_DAY_US}
              AS BIGINT) AS cd
  FROM (
    SELECT user_id, MIN(us) AS start_us,
           MIN(CASE WHEN event_type = 'error' THEN us END) AS err_us
    FROM ev GROUP BY user_id
  ) CROSS JOIN endcap
),
days AS (
  SELECT COALESCE(ed, cd) AS t,
         CAST(SUM(CASE WHEN ed IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS d,
         CAST(SUM(CASE WHEN ed IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM per_user GROUP BY COALESCE(ed, cd)
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM per_user),
atrisk AS (
  SELECT t, d, c,
         CAST(n_users
           - COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT)
           AS n_risk
  FROM days CROSS JOIN tot
),
steps AS (
  SELECT t AS s,
         CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
  FROM atrisk WHERE d > 0
)
SELECT a.t AS day, a.n_risk AS n_at_risk, a.d AS n_events,
       a.c AS n_censored,
       list_reduce(
         list_prepend(CAST(1.0 AS DOUBLE),
                      list(st.factor ORDER BY st.s)),
         (acc, x) -> acc * x) AS survival
FROM atrisk a JOIN steps st ON st.s <= a.t
WHERE a.d > 0
GROUP BY a.t, a.n_risk, a.d, a.c
"""


QUERIES = {
    "session_lengths": session_lengths,
    "returns_mix_shift": returns_mix_shift,
    "user_survival_km": user_survival_km,
}

ORACLES = {
    "session_lengths": SESSION_LENGTHS_SQL,
    "returns_mix_shift": RETURNS_MIX_SHIFT_SQL,
    "user_survival_km": USER_SURVIVAL_KM_SQL,
}
