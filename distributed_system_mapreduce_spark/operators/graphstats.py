"""Graph-quality metrics, wave 17:

- graph_modularity     : Newman modularity Q of the LPA communities
                         over the strong co-purchase graph — the
                         standard "are these communities real
                         structure or noise" score that makes
                         community_lpa's output auditable (Q near 0
                         = no better than random; Q >> 0 = genuine
                         cluster structure).
- graph_assortativity  : degree assortativity (Pearson correlation
                         of endpoint degrees over the edge list) —
                         the hub-mixing diagnostic: positive =
                         hub-to-hub (social-style), negative =
                         hub-to-leaf (infrastructure-style), the
                         shape that decides whether degree-based
                         salting will help the joins over this graph.

Exactness: both reduce to EXACT integer/DECIMAL sums over the edge
and label tables (no per-community float sums — modularity's
Σ L_c / m and Σ d_c^2 / (2m)^2 are folded as two exact integer
totals), combined in ONE fixed-order double expression; NULL on
degenerate denominators, spelled identically in both engines.

Scale shape (100 TB): the edge table is the checkpointed strong-tie
graph (one distinct + co-pair shuffle); labels are the LPA rounds
(shared machinery with community_lpa via lpa_labels); everything
else is partial-agg shuffles on node/community keys and broadcast
1-row totals. Driver state zero; no windows.

Refs: Newman 2004 ("Finding and evaluating community structure in
networks") for Q; Newman 2002 ("Assortative mixing in networks").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.graphs import (
    strong_edges,
)
from distributed_system_mapreduce_spark.operators.relational_ext7 import (
    LPA_CTES,
    LPA_SUPPORT,
    lpa_labels,
)
from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut


# ---------------------------------------------------------- graph_modularity
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q = Σ_c [ L_c/m − (d_c/2m)² ] over the LPA partition, computed
    from two exact integer totals: intra-community directed edge
    count (= 2 Σ L_c) and Σ_c d_c² (DECIMAL(38,0) — degree sums
    square fast), so Q is one fixed-order double expression — no
    per-community float accumulation to drift."""
    edges, labels = lpa_labels(spark, sf_dir)
    lab = labels.transform(cut)  # consumed by 3 subtrees
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # directed edges whose endpoints share a community
    intra = (
        edges.join(lab.withColumnRenamed("node", "src")
                   .withColumnRenamed("label", "cs"), "src")
        .join(lab.withColumnRenamed("node", "dst")
              .withColumnRenamed("label", "cd"), "dst")
        .where(F.col("cs") == F.col("cd"))
        .groupBy().agg(F.count("*").cast("long").alias("intra_dir"))
    )
    comm = (
        deg.join(lab.withColumnRenamed("node", "src"), "src")
        .groupBy("label").agg(F.sum("d").alias("dc"))
    )
    sums = comm.groupBy().agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum((F.col("dc") * F.col("dc")).cast("decimal(38,0)"))
        .alias("sum_dc_sq"),
    )
    m2 = edges.groupBy().agg(F.count("*").cast("long").alias("m2"))
    return (
        intra.crossJoin(F.broadcast(sums)).crossJoin(F.broadcast(m2))
        .selectExpr(
            "CAST(m2 DIV 2 AS BIGINT) AS n_edges",
            "n_communities",
            "CAST(intra_dir DIV 2 AS BIGINT) AS intra_edges",
            "CASE WHEN m2 = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            "CAST(intra_dir AS DOUBLE) / m2 "
            "- CAST(sum_dc_sq AS DOUBLE) / (CAST(m2 AS DOUBLE) * m2) "
            "END AS modularity",
        )
    )


GRAPH_MODULARITY_SQL = f"""
WITH {LPA_CTES},
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
intra AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS intra_dir
  FROM edges e
  JOIN l3 a ON e.src = a.node
  JOIN l3 b ON e.dst = b.node
  WHERE a.label = b.label
),
comm AS (
  SELECT l3.label, SUM(d) AS dc
  FROM deg JOIN l3 ON deg.src = l3.node
  GROUP BY l3.label
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         CAST(SUM(CAST(dc * dc AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS sum_dc_sq
  FROM comm
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges)
SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
       n_communities,
       CAST(intra_dir // 2 AS BIGINT) AS intra_edges,
       CASE WHEN m2 = 0 THEN CAST(NULL AS DOUBLE) ELSE
       CAST(intra_dir AS DOUBLE) / m2
       - CAST(sum_dc_sq AS DOUBLE) / (CAST(m2 AS DOUBLE) * m2)
       END AS modularity
FROM intra CROSS JOIN sums CROSS JOIN m
"""


# ------------------------------------------------------- graph_assortativity
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity r over the symmetric edge list: Pearson
    correlation of (deg(src), deg(dst)) across directed edges —
    symmetric, so Sx = Sy and Sxx = Syy and
    r = (m2·Sxy − Sx²) / (m2·Sxx − Sx²). All sums are exact
    DECIMAL(38,0) folds of integer degree products; r is one
    fixed-order double expression, NULL for degree-regular graphs
    (zero variance)."""
    li = load_table(spark, "lineitem", sf_dir)
    edges = strong_edges(li, LPA_SUPPORT).transform(cut)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    de = (
        edges.join(deg.withColumnRenamed("src", "a")
                   .withColumnRenamed("d", "du"),
                   F.col("src") == F.col("a"))
        .join(deg.withColumnRenamed("src", "b")
              .withColumnRenamed("d", "dv"),
              F.col("dst") == F.col("b"))
        .select("du", "dv")
    )
    sums = de.groupBy().agg(
        F.count("*").cast("long").alias("m2"),
        F.sum(F.col("du").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("du") * F.col("du")).cast("decimal(38,0)"))
        .alias("sxx"),
        F.sum((F.col("du") * F.col("dv")).cast("decimal(38,0)"))
        .alias("sxy"),
    )
    return sums.selectExpr(
        "CAST(m2 DIV 2 AS BIGINT) AS n_edges",
        "CASE WHEN m2 * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        " (m2 * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " / (m2 * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " END AS assortativity",
    )


GRAPH_ASSORTATIVITY_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {LPA_SUPPORT}
),
edges AS (
  SELECT u AS src, v AS dst FROM und
  UNION ALL
  SELECT v, u FROM und
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
de AS (
  SELECT da.d AS du, db.d AS dv
  FROM edges e
  JOIN deg da ON e.src = da.src
  JOIN deg db ON e.dst = db.src
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(CAST(du AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(du * du AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS sxx,
         CAST(SUM(CAST(du * dv AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS sxy
  FROM de
)
SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
       CASE WHEN m2 * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
            THEN CAST(NULL AS DOUBLE) ELSE
       (m2 * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (m2 * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       END AS assortativity
FROM sums
"""


QUERIES = {
    "graph_modularity": graph_modularity,
    "graph_assortativity": graph_assortativity,
}

ORACLES = {
    "graph_modularity": GRAPH_MODULARITY_SQL,
    "graph_assortativity": GRAPH_ASSORTATIVITY_SQL,
}
