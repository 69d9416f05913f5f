"""Relational wave 19: robust statistics and audience analysis.

- events_mad_outliers : median/MAD robust outlier census per event
                        type — the z-score (events_anomaly) sibling
                        that a heavy-tailed value column needs, since
                        mean and stddev are themselves dragged by the
                        outliers they are supposed to flag.
- audience_overlap    : pairwise audience intersection / Jaccard
                        between event types — 'do purchasers also
                        click' set algebra computed without a
                        user-level self-join.

Reference parity: maple+juice compositions in the reference's model
(/root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table

MAD_K = 3.0  # flag |value - median| > MAD_K * 1.4826 * MAD


# ------------------------------------------------------ events_mad_outliers
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median, MAD (median
    absolute deviation), and how many events sit beyond
    MAD_K * 1.4826 * MAD of the median (1.4826 scales MAD to sigma
    under normality, so the threshold reads like a 3-sigma rule that
    outliers cannot corrupt).

    Exactness: both medians use the exact interpolating percentile
    (Spark percentile == DuckDB quantile_cont bit-for-bit, the
    price_quantiles precedent); |value - median| and the threshold
    compare are per-row fixed-order double ops; the flag count is an
    exact BIGINT. Shape: two aggregation passes over events (median,
    then deviation median + count) with the per-type medians riding a
    broadcast join — bounded type cardinality keeps the exact
    per-group sort safe; unbounded groups would switch to
    approx_percentile."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = F.broadcast(
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("median")))
    dev = ev.join(med, "event_type").select(
        "event_type", "median",
        F.abs(F.col("value") - F.col("median")).alias("adev"))
    mads = F.broadcast(
        dev.groupBy("event_type")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad")))
    return (
        dev.join(mads, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("median").alias("median"),
            F.min("mad").alias("mad"),
            F.sum(
                (F.col("adev")
                 > F.lit(MAD_K) * F.lit(1.4826) * F.col("mad"))
                .cast("long")).cast("long").alias("n_outliers"),
        )
    )


EVENTS_MAD_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, m.median, abs(e.value - m.median) AS adev
  FROM events e JOIN med m USING (event_type)
),
mads AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(median) AS median, MIN(mad) AS mad,
       CAST(SUM(CASE WHEN adev > {MAD_K} * 1.4826 * mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mads USING (event_type)
GROUP BY event_type
"""


# --------------------------------------------------------- audience_overlap
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: for every type
    pair (a < b), how many distinct users did BOTH, each type's
    audience size, and the Jaccard overlap — the cross-sell /
    cannibalization readout.

    Shape: ONE shuffle to per-user sorted type sets, then pairs
    expand IN-ARRAY (bounded by the handful of types a user can
    have — the graphs.py co-purchase idiom, never a distinct x
    distinct self-join whose hot types would explode); per-type
    audience sizes come off the same set table and ride a broadcast
    join. Jaccard is one fixed-order double division over exact
    BIGINTs."""
    ev = load_table(spark, "events", sf_dir)
    sets = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
    )
    pairs = (
        sets.select(F.explode(F.expr(
            "flatten(transform(types, (a, i) -> "
            "transform(slice(types, i + 2, size(types)), "
            "b -> struct(a AS ta, b AS tb))))")).alias("p"))
        .groupBy(F.col("p.ta").alias("type_a"),
                 F.col("p.tb").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    aud = F.broadcast(
        sets.select(F.explode("types").alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (
        pairs
        .join(aud.select(F.col("t").alias("type_a"),
                         F.col("n").alias("n_a")), "type_a")
        .join(aud.select(F.col("t").alias("type_b"),
                         F.col("n").alias("n_b")), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            (F.col("n_both").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
             .cast("double")).alias("jaccard"),
        )
    )


AUDIENCE_OVERLAP_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
aud AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, aa.n AS n_a, ab.n AS n_b, n_both,
       CAST(n_both AS DOUBLE)
         / CAST(aa.n + ab.n - n_both AS DOUBLE) AS jaccard
FROM pairs
JOIN aud aa ON aa.event_type = type_a
JOIN aud ab ON ab.event_type = type_b
"""


QUERIES = {
    "events_mad_outliers": events_mad_outliers,
    "audience_overlap": audience_overlap,
}

ORACLES = {
    "events_mad_outliers": EVENTS_MAD_OUTLIERS_SQL,
    "audience_overlap": AUDIENCE_OVERLAP_SQL,
}
