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
the K codewords are INLINED as literal arrays into a narrow
array_min(struct(d2, cid)) argmin map (r10 — the previous shape
broadcast-joined a K-row centroid table and re-extracted the argmin
with a corpus-wide groupBy(vec_id) partial-min Exchange; same
arithmetic, one whole shuffle and a xK row blowup removed per
round), then the centroid update via posexplode ->
groupBy(cluster, pos) mean (map-side combine reduces the exchange to
K x DIM rows per input partition). The only driver collect is the
K x DIM centroid matrix per iteration — bounded by K, never by
corpus size. On a real 100 TB corpus you would .persist()
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
from distributed_system_mapreduce_spark.lineage import cut
from distributed_system_mapreduce_spark.tables import load_table, spread

K_CLUSTERS = 8
KMEANS_ITERS = 4


def _lit_arr(vals: list[float]) -> str:
    """SQL literal array<double> from Python floats. repr() is the
    shortest round-trip representation and CAST(string AS DOUBLE)
    parses it back to the identical double, so inlining centroids
    is bit-exact vs joining them in as a column."""
    return ("array(" + ", ".join(
        f"CAST('{v!r}' AS DOUBLE)" for v in vals) + ")")


def _argmin_lit(cent_rows: list[tuple[int, list[float]]]) -> F.Column:
    """struct(d2, cid) of the nearest centroid with the K centroids
    inlined as literals — a NARROW codegen-stage map (r10: the old
    _assign broadcast-joined the K-row centroid table and took the
    argmin with a corpus-wide groupBy(vec_id) partial-min shuffle;
    centroids are driver state of size K x DIM, so the join, the xK
    row blowup AND the Exchange are all unnecessary). Distances use
    the same strict left-fold dist2 expression on the same double
    values, and array_min orders struct(d2, cid) exactly like
    min(struct(d2, cid)) did, so assignments are bit-identical."""
    return F.array_min(F.array(*[
        F.struct(
            F.expr(V.dist2_expr("embedding", _lit_arr(list(emb))))
            .alias("d2"),
            F.lit(int(cid)).cast("long").alias("cid"),
        )
        for cid, emb in sorted(cent_rows)
    ]))


def _assign(vecs: DataFrame,
            cent_rows: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment over literal centroids: one narrow
    map, zero shuffles (see _argmin_lit)."""
    best = _argmin_lit(cent_rows)
    return vecs.select(
        "vec_id",
        best["cid"].alias("cluster"),
        best["d2"].alias("dist2"),
    )


def seed_rows(vecs: DataFrame) -> list[tuple[int, list[float]]]:
    """The deterministic seed centroids (the K lowest vec_ids) as
    driver rows — K x DIM floats, bounded state."""
    rows = (
        vecs.filter(F.col("vec_id") < K_CLUSTERS)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cemb"))
        .collect()
    )
    return sorted((int(r["cid"]), list(r["cemb"])) for r in rows)


def _train(spark: SparkSession,
           vecs: DataFrame) -> list[tuple[int, list[float]]]:
    """The shared Lloyd's loop (KMEANS_ITERS rounds, deterministic
    seed = the K lowest vec_ids): returns the FINAL centroids so
    both consumers (kmeans_embed's assignment output, kmeans_certify's
    final-cost flag) train exactly once instead of certify re-running
    kmeans_embed end-to-end (the r9 verdict's double-Lloyd's nit).

    r10 shape: each round's assignment is the narrow literal-centroid
    argmin (_argmin_lit) — the old round plan broadcast the K-row
    centroid table into a xK-row join and took the argmin back out
    with a corpus-wide groupBy(vec_id) partial-min Exchange (plus a
    first(embedding) carry). Centroids are driver state, so the whole
    round is now: narrow argmin map -> posexplode -> ONE partial-agg
    shuffle of K x DIM x n_partitions partial sums. Centroid means
    are float avgs whose partial-sum order already depended on the
    input partitioning (kmeans_embed is rows-only for exactly that
    reason); the hash-gated kmeans_certify output only uses the
    seed-round assignment and the monotone flag, both unaffected."""
    prev = dict(seed_rows(vecs))
    for _ in range(KMEANS_ITERS):
        best = _argmin_lit(sorted(prev.items()))
        asg = vecs.select(best["cid"].alias("cluster"), "embedding")
        upd = (
            asg.select("cluster",
                       F.posexplode(
                           F.col("embedding").cast("array<double>"))
                       .alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("cemb"))
        )
        new = {int(r["cluster"]): list(r["cemb"]) for r in upd.collect()}
        prev = {**prev, **new}  # empty clusters keep their old centroid
    return sorted(prev.items())


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
    # spread(): the narrow literal-centroid argmin (r10) runs the
    # interpreted dist2 folds inside the scan stage — on the local
    # single-row-group parquet that is ONE task, so rebalance first
    # (the old shape hid this behind its groupBy(vec_id) Exchange,
    # which re-spread the agg side; with the Exchange gone the scan
    # partitioning IS the compute partitioning).
    vecs = spread(load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"))
    if persist:
        from pyspark import StorageLevel

        vecs = vecs.persist(StorageLevel.MEMORY_AND_DISK)
    # one barrier: the final assignment feeds both the size rollup and
    # the output join — without it the argmin map replays per consumer.
    # Under persist=True the barrier is a SHALLOW persist cut, not a
    # checkpoint: lineage survives (executor loss degrades to
    # recompute — the cluster posture's whole point) and the cached
    # vector table stays visible in the final plan.
    final = _assign(vecs, _train(spark, vecs)).transform(
        (lambda df: cut(df, mode="persist")) if persist else cut)
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

    Shape (r10): ONE narrow-argmin pass computes the round-1 stats
    AND the round-1 cost in the same grouped aggregate (the old plan
    paid a separate global-sum pass for the cost, then recomputed the
    whole round-1 assignment when the returned DataFrame was
    consumed), the shared _train loop, and ONE more narrow-argmin
    pass for the final cost. The output is rebuilt from the K
    collected stat rows — bounded driver state, exactly the pattern
    the monotone flag already used — so consuming the result never
    re-runs the assignment. r1_cost is now the sum of the K exact
    per-cluster float sums instead of one global float sum; float
    sums were already partial-aggregation-order dependent, and the
    flag carries a 1e-9 relative slack precisely for summation-order
    noise."""
    vecs = spread(load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"))
    r1 = _assign(vecs, seed_rows(vecs))
    stats = sorted(
        r1.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n_assigned"),
             F.sum("vec_id").cast("long").alias("sum_vec_id"),
             F.sum("dist2").alias("cost"))
        .collect(),
        key=lambda r: r["cluster"],
    )
    r1_cost = sum(r["cost"] for r in stats)
    final_cost = (
        _assign(vecs, _train(spark, vecs))
        .agg(F.sum("dist2")).collect()[0][0]
    )
    # tiny relative slack: the two costs are float sums; monotonicity
    # holds mathematically round over round, the slack only guards
    # summation-order noise when the algorithm has already converged
    monotone = bool(final_cost <= r1_cost * (1 + 1e-9))
    return spark.createDataFrame(
        [(int(r["cluster"]), int(r["n_assigned"]),
          int(r["sum_vec_id"]), monotone) for r in stats],
        "cluster long, n_assigned long, sum_vec_id long, "
        "monotone_ok boolean",
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
