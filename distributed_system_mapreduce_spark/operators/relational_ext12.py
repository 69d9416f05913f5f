"""Relational wave 16: deterministic forecasting.

- events_holt_forecast: Holt's linear (level+trend) exponential
  smoothing over each type's daily volume, with a one-step-ahead
  backtest error — the first-line forecast every capacity planner
  runs before reaching for a model.

Reference parity: SURVEY §2.C extension (a maple+juice pair in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table

# exactly-representable binary fractions: the literals parse to the
# identical double on both engines
ALPHA = 0.5
BETA = 0.25


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing per event type: level and
    trend fold over the day-ordered daily counts (l_1 = x_1, b_1 = 0;
    then l_t = α·x_t + (1-α)(l+b), b_t = β(l_t - l) + (1-β)b), with
    the one-step-ahead squared backtest error accumulated in the same
    pass; outputs the fitted state, the next-day forecast, and RMSE.

    Determinism for an inherently sequential smoother: the fold runs
    over the bounded day-sorted array (user_survival_km discipline) —
    same strict left fold, same IEEE double sequence on both engines.
    Every accumulator field recomputes what it needs from the OLD
    state inline (no field reads another field updated in the same
    step), which makes the lambda correct under BOTH Spark's
    snapshot semantics and DuckDB's sequential field mutation (the
    events_cusum gotcha). Shape: one partial-agg shuffle to the
    bounded (type, day) grid, one bounded per-type fold."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    a, b1 = ALPHA, 1.0 - ALPHA
    b, b2 = BETA, 1.0 - BETA
    # new level from old state, written out once and inlined wherever
    # the new value is needed
    newl = f"({a} * e.x + {b1} * (acc.l + acc.b))"
    fold = (
        "aggregate(array_sort(arr), "
        "named_struct("
        "  'n', CAST(0 AS BIGINT), 'l', CAST(0 AS DOUBLE),"
        "  'b', CAST(0 AS DOUBLE), 'sse', CAST(0 AS DOUBLE)), "
        # result fields MUST mirror the zero's field order (Spark
        # unifies the accumulator type positionally); expressions read
        # the snapshot acc, so order carries no semantics here
        "(acc, e) -> named_struct("
        "  'n', acc.n + 1,"
        f" 'l', CASE WHEN acc.n = 0 THEN e.x ELSE {newl} END,"
        f" 'b', CASE WHEN acc.n = 0 THEN CAST(0 AS DOUBLE)"
        f"      ELSE {b} * ({newl} - acc.l) + {b2} * acc.b END,"
        "  'sse', CASE WHEN acc.n = 0 THEN CAST(0 AS DOUBLE)"
        "        ELSE acc.sse + (e.x - (acc.l + acc.b))"
        "              * (e.x - (acc.l + acc.b)) END))"
    )
    return (
        daily.groupBy("event_type")
        .agg(F.expr("collect_list(struct(day, x))").alias("arr"))
        .select("event_type", F.expr(fold).alias("r"))
        .select(
            "event_type",
            F.col("r.n").alias("n_days"),
            F.col("r.l").alias("level"),
            F.col("r.b").alias("trend"),
            (F.col("r.l") + F.col("r.b")).alias("forecast_next"),
            F.when(
                F.col("r.n") > 1,
                F.sqrt(F.col("r.sse")
                       / (F.col("r.n") - 1).cast("double")),
            ).alias("backtest_rmse"),
        )
    )


# A DuckDB list_reduce struct fold CANNOT express Holt: level needs
# the OLD trend and trend needs the OLD level, but DuckDB mutates the
# accumulator field-by-field (the events_cusum gotcha), so whichever
# field updates first poisons the other. The oracle recurses over the
# day index instead — a recursive CTE step sees a clean snapshot of
# the previous state, matching Spark's aggregate() semantics exactly.
EVENTS_HOLT_FORECAST_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY day) AS i
  FROM daily
),
holt(event_type, i, l, b, sse) AS (
  SELECT event_type, i, x, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
  FROM idx WHERE i = 1
  UNION ALL
  SELECT h.event_type, d.i,
         {ALPHA} * d.x + {1.0 - ALPHA} * (h.l + h.b),
         {BETA} * (({ALPHA} * d.x + {1.0 - ALPHA} * (h.l + h.b))
                   - h.l) + {1.0 - BETA} * h.b,
         h.sse + (d.x - (h.l + h.b)) * (d.x - (h.l + h.b))
  FROM holt h JOIN idx d
    ON d.event_type = h.event_type AND d.i = h.i + 1
),
final AS (
  SELECT event_type, i, l, b, sse,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY i DESC) AS rn
  FROM holt
)
SELECT event_type, CAST(i AS BIGINT) AS n_days, l AS level,
       b AS trend, l + b AS forecast_next,
       CASE WHEN i > 1 THEN sqrt(sse / CAST(i - 1 AS DOUBLE)) END
         AS backtest_rmse
FROM final WHERE rn = 1
"""


QUERIES = {
    "events_holt_forecast": events_holt_forecast,
}

ORACLES = {
    "events_holt_forecast": EVENTS_HOLT_FORECAST_SQL,
}
