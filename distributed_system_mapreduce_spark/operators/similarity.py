"""Similarity search over the `embeddings` table (array<float> 64-d).

- ann_topk_brute : exact cosine top-k for a query subset — the
                   correctness baseline. A cross join: fine for a
                   bounded query set, NOT the 100 TB path.
- ann_topk_lsh   : random-hyperplane LSH bucketing (linear sketch,
                   one narrow shuffle) with exact re-ranking inside
                   buckets — the scale path (bucket join replaces the
                   cross join; expected bucket size n / 2^planes).
- dedup_embedding: near-dup pairs = same LSH bucket AND cosine >= tau
                   (embedding-level near-dedup for training data).

All cosines are bit-identical to the DuckDB oracle (see
functions/vectors.py), so even ranks hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import vectors as V
from distributed_system_mapreduce_spark.tables import load_table

TOP_K = 10
QUERY_MOD = 100  # queries = vecs with vec_id % QUERY_MOD == 0
DUP_TAU = 0.3  # the synthetic corpus has no planted near-dups; 0.3 still
# exercises the bucket-then-threshold path with non-trivial output


def _with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.select(
        "vec_id", "embedding",
        F.expr(V.norm_expr("embedding")).alias("norm"),
    )


_NORM_SQL = f"""
  SELECT vec_id, embedding, {V.norm_sql("embedding")} AS norm
  FROM embeddings
"""

_COS = (
    "({dot} / (a.norm * b.norm))"
)


def _cos_spark() -> F.Column:
    dot = V.dot_expr("a.embedding", "b.embedding")
    return F.expr(f"{dot} / (a.norm * b.norm)")


_COS_SQL = f"{V.dot_sql('a.embedding', 'b.embedding')} / (a.norm * b.norm)"


def ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors by cosine for the query subset."""
    from pyspark.sql import Window

    vecs = _with_norm(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).alias("a")
    c = vecs.alias("b")
    pairs = (
        q.join(c, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            _cos_spark().alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


ANN_TOPK_BRUTE_SQL = f"""
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           {_COS_SQL} AS cosine
    FROM ({_NORM_SQL}) a
    JOIN ({_NORM_SQL}) b ON a.vec_id <> b.vec_id
    WHERE a.vec_id % {QUERY_MOD} = 0
  )
)
WHERE rank <= {TOP_K}
"""


def _with_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _with_norm(spark, sf_dir)
    return vecs.withColumn(
        "bucket", F.expr(V.lsh_bucket_expr("embedding")))


_BUCKET_SQL = f"""
  SELECT vec_id, embedding, norm,
         {V.lsh_bucket_sql("embedding")} AS bucket
  FROM ({_NORM_SQL})
"""


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's bucket; exact
    cosine re-rank inside the bucket. Recall < 1 by construction —
    the oracle runs the same sketch, so results still hash-match."""
    from pyspark.sql import Window

    vecs = _with_bucket(spark, sf_dir)
    q = vecs.filter(F.col("vec_id") % QUERY_MOD == 0).alias("a")
    c = vecs.alias("b")
    pairs = (
        q.join(c, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.col("a.bucket").alias("bucket"),
            _cos_spark().alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


ANN_TOPK_LSH_SQL = f"""
SELECT query_id, neighbor_id, bucket, cosine, rank FROM (
  SELECT query_id, neighbor_id, bucket, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           a.bucket AS bucket, {_COS_SQL} AS cosine
    FROM ({_BUCKET_SQL}) a
    JOIN ({_BUCKET_SQL}) b
      ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    WHERE a.vec_id % {QUERY_MOD} = 0
  )
)
WHERE rank <= {TOP_K}
"""


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: same LSH bucket, cosine >= tau."""
    vecs = _with_bucket(spark, sf_dir)
    a = vecs.alias("a")
    b = vecs.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cos_spark().alias("cosine"),
        )
        .filter(F.col("cosine") >= DUP_TAU)
    )


DEDUP_EMBEDDING_SQL = f"""
SELECT vec_a, vec_b, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS_SQL} AS cosine
  FROM ({_BUCKET_SQL}) a
  JOIN ({_BUCKET_SQL}) b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
WHERE cosine >= {DUP_TAU}
"""


QUERIES = {
    "ann_topk_brute": ann_topk_brute,
    "ann_topk_lsh": ann_topk_lsh,
    "dedup_embedding": dedup_embedding,
}

ORACLES = {
    "ann_topk_brute": ANN_TOPK_BRUTE_SQL,
    "ann_topk_lsh": ANN_TOPK_LSH_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
}
