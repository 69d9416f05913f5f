"""Shared co-purchase graph builders.

Every graph operator (degree census, triangles, communities,
PageRank, BFS, link prediction, basket rules) starts from the same
construction: unordered part pairs that share an order. The naive
form — distinct (order, part) then a self-join on the order key — is
TWO shuffles plus a shuffle JOIN; since pair fan-out per order is
bounded (lines-per-order choose 2, <= 21 for TPC-H's 7-line cap),
collapsing each order to its sorted part SET and expanding pairs
INSIDE the array is strictly better: one groupBy shuffle, a narrow
codegen'd explode, then the pair count shuffle — the join is gone.
Measured 5.8s -> 2.1s warm at sf0.1 for the support>=2 edge table,
identical output. The per-order array is bounded, so this holds at
100 TB (a pathological order with millions of lines would need the
self-join form back — guard by order-size profile if the data model
ever allows it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sequence(1, 0) is DESCENDING [1, 0] in Spark, so the < 2 guard is
# required, not defensive
_PAIRS_EXPR = (
    "CASE WHEN size(a) < 2 THEN "
    "CAST(array() AS array<struct<u:bigint,v:bigint>>) ELSE "
    "flatten(transform(sequence(1, size(a) - 1), "
    "i -> transform(slice(a, i + 1, size(a) - i), "
    "y -> named_struct('u', element_at(a, i), 'v', y)))) END"
)


def order_part_sets(li: DataFrame) -> DataFrame:
    """(l_orderkey, a): each order's sorted DISTINCT part array —
    collect_set dedups, so callers must never pay a distinct() first.
    The sufficient statistic for basket analytics: row count = basket
    count, explode(a) = the distinct (order, part) table, the pair
    expansion below = co-purchase pairs."""
    return li.select("l_orderkey", "l_partkey").groupBy(
        "l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("a"))


def explode_pairs(sets: DataFrame) -> DataFrame:
    """(u, v) with u < v from an order_part_sets table, one row per
    (order, unordered part pair). The explode stays inline over the
    materialized array column (Generate is the barrier that keeps the
    pair expansion evaluated once — the shingles_from_docs
    projection-collapse lesson)."""
    return (
        sets.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .select("p.u", "p.v")
    )


def copurchase_pairs(li: DataFrame) -> DataFrame:
    """(u, v) with u < v, one row per (order, unordered part pair).
    `li` must carry l_orderkey, l_partkey."""
    return explode_pairs(order_part_sets(li))


def copair_counts(li: DataFrame) -> DataFrame:
    """(u, v, w): co-order count per unordered pair."""
    return copurchase_pairs(li).groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("w"))


def strong_undirected(li: DataFrame, support: int) -> DataFrame:
    """Thresholded strong-tie pairs (u < v, w >= support)."""
    return copair_counts(li).where(F.col("w") >= support)


def strong_edges(li: DataFrame, support: int) -> DataFrame:
    """Symmetric (src, dst) edge table of the strong-tie graph."""
    und = strong_undirected(li, support)
    return (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(und.select(F.col("v").alias("src"),
                                F.col("u").alias("dst")))
    )
