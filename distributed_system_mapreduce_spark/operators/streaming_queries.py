"""Oracle-backed queries that run STRUCTURED STREAMING jobs to
completion and certify their output against a plain-SQL oracle.

The streaming layer (streaming/jobs.py — 30+ jobs) was until round 5
covered only by pytest batch-twin parity tests. These queries close
the loop for the driver's correctness gate: each builds the REAL
file-source stream over the events parquet, runs the registered
streaming aggregation with Trigger.AvailableNow (process everything,
then stop — the batch-equivalent execution mode), drains it into a
memory sink, and returns the drained table. A hash match against the
oracle proves the streaming operator computes exactly the batch
answer on the same data — the strongest cross-engine evidence a
streaming job can get.

Complete output mode is used so the watermark withholds nothing (the
tail windows of a finite file feed would otherwise stay open in
append mode); the watermark still bounds state exactly as in
production. Each drain gets a fresh memory-sink name so repeated
gate/bench invocations in one session never collide.

The memory sink is the GATE harness only (finalized window counts —
calendar-bounded rows — on the driver); the production drain for
these jobs is stream_to_filestore / rollup_delta_sink
(streaming/jobs.py), which lands micro-batches in the lake without
driver-side result state.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DRAIN_SEQ = itertools.count()


def _drain(df: DataFrame, prefix: str) -> str:
    from distributed_system_mapreduce_spark.streaming import (
        run_stream_to_memory,
    )

    name = f"{prefix}_{next(_DRAIN_SEQ)}"
    run_stream_to_memory(df, name, output_mode="complete")
    return name


# ---------------------------------------------- stream_windowed_rollup
def stream_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily tumbling-window rollup (windowed_counts — the
    streaming twin of events_daily_rollup) run as a real stream and
    certified by oracle: file-source stream -> watermarked window agg
    -> availableNow drain -> memory table. State is bounded by
    watermark horizon x event_type cardinality regardless of stream
    length; at 100 TB/day the same plan runs on a kafka source with
    the identical window/watermark semantics."""
    from distributed_system_mapreduce_spark.streaming import (
        read_events_stream,
        windowed_counts,
    )

    ev = read_events_stream(spark, sf_dir)
    name = _drain(windowed_counts(ev), "sq_rollup")
    return spark.table(name).select(
        F.to_date("day").alias("day"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


STREAM_WINDOWED_ROLLUP_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CAST(ts AS DATE), event_type
"""


# ---------------------------------------------- stream_topk_users_daily
_TOPK = 5


def stream_topk_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k as a stream: the per-(day, user) activity
    counts finalize in the streaming agg (windowed_user_counts);
    ranking runs on the DRAINED finalized rows (topk_per_window, full
    deterministic tie-break) — the two-stage shape streaming top-k
    requires, because rank() over a still-open window would be
    retracted. Oracle recomputes the same top-5 from the batch
    table."""
    from distributed_system_mapreduce_spark.streaming import (
        read_events_stream,
        topk_per_window,
        windowed_user_counts,
    )

    ev = read_events_stream(spark, sf_dir)
    name = _drain(windowed_user_counts(ev), "sq_topk")
    ranked = topk_per_window(spark.table(name), _TOPK)
    return ranked.select(
        F.to_date("day").alias("day"),
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
    )


STREAM_TOPK_USERS_DAILY_SQL = f"""
SELECT CAST(day AS DATE) AS day, user_id, n_events FROM (
  SELECT day, user_id, n_events,
         ROW_NUMBER() OVER (PARTITION BY day
                            ORDER BY n_events DESC, user_id ASC) AS rk
  FROM (
    SELECT CAST(ts AS DATE) AS day, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
  )
)
WHERE rk <= {_TOPK}
"""


# ---------------------------------------------- stream_enriched_rollup
def stream_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment certified by oracle: the event stream
    joined per micro-batch against the BROADCAST customer dimension
    (no stream-side state), filtered to purchases, rolled into
    watermarked daily windows per market segment
    (enrich_with_customers), drained with availableNow. The oracle
    recomputes the join+rollup as plain SQL — a hash match proves the
    stream-static join semantics equal the batch join on the same
    feed."""
    from distributed_system_mapreduce_spark.streaming import (
        enrich_with_customers,
        read_events_stream,
    )
    from distributed_system_mapreduce_spark.tables import load_table

    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    name = _drain(enrich_with_customers(ev, cust), "sq_enrich")
    return spark.table(name).select(
        F.to_date("day").alias("day"),
        F.col("c_mktsegment").alias("segment"),
        F.col("n_purchases").cast("long").alias("n_purchases"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


STREAM_ENRICHED_ROLLUP_SQL = """
SELECT CAST(ts AS DATE) AS day, c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
WHERE event_type = 'purchase'
GROUP BY CAST(ts AS DATE), c_mktsegment
"""


QUERIES = {
    "stream_windowed_rollup": stream_windowed_rollup,
    "stream_topk_users_daily": stream_topk_users_daily,
    "stream_enriched_rollup": stream_enriched_rollup,
}

ORACLES = {
    "stream_windowed_rollup": STREAM_WINDOWED_ROLLUP_SQL,
    "stream_topk_users_daily": STREAM_TOPK_USERS_DAILY_SQL,
    "stream_enriched_rollup": STREAM_ENRICHED_ROLLUP_SQL,
}
