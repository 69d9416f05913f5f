"""Rollup combinators shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangular_cumsum(df: DataFrame, key: str, val: str,
                      out: str) -> DataFrame:
    """Exact prefix sum over a BOUNDED aggregated table (a calendar,
    a bucket index): broadcast triangular self-join on key' <= key,
    then re-group — never a global window, which would serialize all
    rows onto one task. O(rows^2) join fan-out, fine because callers
    only apply it AFTER aggregation has reduced the data to O(days)
    or O(buckets) rows; for unbounded keys use the partitioned
    prefix-sum stitch (orders_backlog) instead.

    Input rows must be unique per ``key`` (true for aggregated
    tables); output carries (key, val, out)."""
    b = df.select(F.col(key).alias("_tc_k"), F.col(val).alias("_tc_v"))
    return (
        df.join(F.broadcast(b), F.col("_tc_k") <= F.col(key))
        .groupBy(key, val)
        .agg(F.sum("_tc_v").cast("long").alias(out))
        .select(key, val, out)
    )
