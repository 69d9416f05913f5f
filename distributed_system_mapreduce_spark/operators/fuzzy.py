"""Entity resolution / fuzzy matching: q-gram blocked edit-distance
join — the record-linkage primitive (find near-identical names
across catalogs) done without ever comparing all pairs.

Blocking is the whole game at scale: levenshtein over N x N names is
quadratic, but two names within edit distance d MUST share at least
one character q-gram when both are longer than q·(d+1) — so names
are exploded into distinct 3-grams, candidates come from a gram
equi-join (+ a length-difference filter), and the exact distance
verifies only candidates. Same shape as the MinHash-LSH text dedup
(dedup.py): cheap linear sketch -> bucket join -> exact verify.

Skew note (100 TB): stop-grams (a gram present in a large fraction
of all names) create hot blocks; production runs cap blocking grams
by document frequency and accept the bounded recall loss, or fall
back to the length-bucketed join for capped names. The synthetic
catalog has no such gram, so the cap stays out of the measured
plan and is documented rather than applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.tables import load_table

Q = 3         # gram width
MAX_DIST = 3  # edit-distance threshold


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All distinct part-name pairs within levenshtein distance
    MAX_DIST, found via 3-gram blocking. Output: (name_a, name_b,
    dist), name_a < name_b."""
    names = (
        load_table(spark, "part", sf_dir)
        .select(F.col("p_name").alias("name")).distinct()
    )
    grams = names.select(
        "name",
        F.explode(F.array_distinct(F.expr(
            f"transform(sequence(1, greatest(length(name) - {Q - 1}, 1)),"
            f" i -> substring(name, i, {Q}))"
        ))).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name_a"),
                F.col("b.name").alias("name_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= MAX_DIST)
        .distinct()
    )
    return (
        cand.withColumn(
            "dist",
            F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= MAX_DIST)
    )


FUZZY_NAME_PAIRS_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
grams AS (
  SELECT DISTINCT name, unnest(list_transform(
    range(1, greatest(length(name) - {Q - 1}, 1) + 1),
    i -> substring(name, i, {Q}))) AS g
  FROM names
),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM grams a JOIN grams b
    ON a.g = b.g AND a.name < b.name
  WHERE abs(length(a.name) - length(b.name)) <= {MAX_DIST}
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {MAX_DIST}
"""


# ------------------------------------------------- entity_canonicalize
def entity_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution, closed: transitive clustering of the fuzzy
    name-match pairs (blocked edit-distance graph) and a canonical
    representative per cluster — the master-data step after pairwise
    matching, composing the SAME connected-components engine that
    backs dedup_components (min-label works on any orderable id;
    here the label is the lexicographically smallest name). Output:
    every clustered name with its canonical form and cluster size.

    The DuckDB oracle is the independent recursive-CTE closure over
    the same pair SQL (the dedup_components formulation on strings).
    """
    from distributed_system_mapreduce_spark.operators.dedup import (
        min_label_components,
    )

    pairs = fuzzy_name_pairs(spark, sf_dir).select("name_a", "name_b")
    labels = min_label_components(pairs)
    from pyspark.sql import Window

    wc = Window.partitionBy("canonical")
    return (
        labels.select(F.col("doc_id").alias("name"),
                      F.col("component").alias("canonical"))
        .withColumn("cluster_size", F.count("*").over(wc).cast("long"))
    )


ENTITY_CANONICALIZE_SQL = f"""
WITH RECURSIVE p AS (
  SELECT name_a, name_b FROM ({FUZZY_NAME_PAIRS_SQL})
),
e AS (
  SELECT name_a AS src, name_b AS dst FROM p
  UNION
  SELECT name_b, name_a FROM p
),
reach(a, b) AS (
  SELECT src, src FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src
),
labels AS (
  SELECT a AS name, MIN(b) AS canonical FROM reach GROUP BY a
)
SELECT name, canonical,
       CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT)
         AS cluster_size
FROM labels
"""


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "entity_canonicalize": entity_canonicalize,
}

ORACLES = {
    "fuzzy_name_pairs": FUZZY_NAME_PAIRS_SQL,
    "entity_canonicalize": ENTITY_CANONICALIZE_SQL,
}
