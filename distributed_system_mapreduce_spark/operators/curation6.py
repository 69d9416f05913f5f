"""Curation wave 6: sampling, survivorship, vocabulary coverage, and
contrastive mining.

- stratified_reservoir : deterministic k-per-stratum uniform sample
                         (salted-hash rank) — the reproducible
                         eyeball/eval sample every corpus audit
                         draws.
- dedup_survivorship   : canonical-doc election per dup cluster by
                         QUALITY (not min id) — the survivorship
                         rule production dedup actually ships.
- tokenizer_oov_rate   : per-source out-of-vocabulary token rate
                         under the corpus top-V vocabulary — the
                         coverage audit before freezing a tokenizer.
- hard_negative_mining : per query vector, the most similar vector
                         with a DIFFERENT label from the LSH
                         candidate set — contrastive-training fuel,
                         mined without any all-pairs scan.

Reference parity: SURVEY §2.D extensions (maple+juice pairs in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.functions import vectors as V
from distributed_system_mapreduce_spark.operators.dedup import (
    DEDUP_COMPONENTS_SQL,
    dedup_components,
)
from distributed_system_mapreduce_spark.operators.similarity import (
    _COS_SQL,
    _NORM_SQL,
    N_BANDS,
    PLANES_PER_BAND,
    QUERY_MOD,
    _bands_union_sql,
    _cos_spark,
)
from distributed_system_mapreduce_spark.operators.text_analysis import (
    QUALITY_SCORE_SQL,
    quality_score,
)
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

# ------------------------------------------------- stratified_reservoir
SAMPLE_K = 5


def stratified_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample: within every (source,
    lang) stratum keep the SAMPLE_K docs with the smallest
    md5('samp:' || doc_id) — uniform in expectation, reproducible
    across runs/engines/partitionings, and independent of every
    other hash decision in the pipeline (the salt; an unsalted
    doc_id hash would correlate with train_val_split's wall — the
    mix_rebalance lesson).

    Shape: narrow hash projection + a window over the bounded
    stratum key (quality_topk_per_group posture); no global order
    anywhere."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source", "lang").orderBy(
        F.asc("h"), F.asc("doc_id"))
    return (
        docs.select("source", "lang", "doc_id", h.alias("h"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("source", "lang", "rk", "doc_id")
    )


STRATIFIED_RESERVOIR_SQL = f"""
SELECT source, lang, rk, doc_id FROM (
  SELECT source, lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source, lang
           ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)) ASC,
                    doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {SAMPLE_K}
"""


# --------------------------------------------------- dedup_survivorship
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document election per near-dup cluster: the member
    with the HIGHEST quality score wins (ties to the smallest
    doc_id) — the survivorship policy real pipelines use instead of
    keep-min-id, so the kept corpus is the best copy of every
    cluster, not the first-crawled one.

    Shape: the component labels (tiny vs corpus — only docs in the
    verified dup graph) join the per-doc quality scores, then ONE
    min(struct) argmax per cluster — partial-aggregated, no window
    over members. Election compares the fixed-order double quality;
    the struct total order makes the winner engine-deterministic."""
    comp = dedup_components(spark, sf_dir)
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    m = comp.join(q, "doc_id")
    return (
        m.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min(F.struct((-F.col("quality")).alias("nq"),
                           F.col("doc_id").alias("d"))).alias("t"),
        )
        .select(
            "component", "n_members",
            F.col("t.d").alias("canonical_id"),
            (-F.col("t.nq")).alias("best_quality"),
        )
    )


DEDUP_SURVIVORSHIP_SQL = f"""
WITH comp AS ({DEDUP_COMPONENTS_SQL}),
q AS (SELECT doc_id, quality FROM ({QUALITY_SCORE_SQL})),
m AS (
  SELECT comp.component, comp.doc_id, q.quality
  FROM comp JOIN q ON comp.doc_id = q.doc_id
),
ranked AS (
  SELECT component, doc_id, quality,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS n_members
  FROM m
)
SELECT component, CAST(n_members AS BIGINT) AS n_members,
       doc_id AS canonical_id, quality AS best_quality
FROM ranked WHERE rn = 1
"""


# --------------------------------------------------- tokenizer_oov_rate
VOCAB_V = 16


def tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: fix the corpus top-VOCAB_V tokens
    as the vocabulary, then report each source's out-of-vocabulary
    token rate — the coverage check run before freezing a tokenizer
    on a new mix (a source with high OOV under the global head needs
    vocab budget or normalization).

    Shape: one map-side-combined token count shuffle; the vocabulary
    is a TakeOrdered top-V (deterministic cnt-desc/token-asc order)
    BROADCAST as a left-join flag onto the re-tokenized stream; the
    census is one bounded per-source aggregate. Exact integer
    counts; one double division."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("source", F.explode(X.tokens()).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(VOCAB_V)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long"))
            .cast("long").alias("n_oov"),
        )
        .select(
            "source", "n_tokens", "n_oov",
            (F.col("n_oov").cast("double")
             / F.col("n_tokens").cast("double")).alias("oov_rate"),
        )
    )


TOKENIZER_OOV_RATE_SQL = f"""
WITH toks AS (
  SELECT source, unnest({X.TOKENS_SQL}) AS token FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
  )
  ORDER BY cnt DESC, token ASC LIMIT {VOCAB_V}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM toks LEFT JOIN vocab v ON toks.token = v.token
GROUP BY source
"""


# -------------------------------------------------- hard_negative_mining
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training mining: for each query-panel vector, the
    MOST similar vector carrying a DIFFERENT label, drawn from the
    banded-LSH candidate set — the hard negatives that make a
    contrastive or metric-learning batch informative, mined at LSH
    cost (bucket equi-joins), never an all-pairs scan.

    Shape: the ann_topk_lsh index store (norm + band buckets,
    localCheckpoint'd — one sketch pass shared by the band join and
    both re-rank sides); candidates keep only label-mismatched
    pairs; the per-query argmax is ONE min(struct) partial
    aggregate (cosine via the strict left-fold, so the winner and
    its score hash identically cross-engine)."""
    emb = spread(load_table(spark, "embeddings", sf_dir))
    bb = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.expr(V.lsh_band_bucket_expr(
                "embedding", i, PLANES_PER_BAND)).alias("bucket"),
        )
        for i in range(N_BANDS)
    ])
    store = (
        emb.select(
            "vec_id", "label", "embedding",
            F.expr(V.norm_expr("embedding")).alias("norm"),
        )
        .withColumn("bands", bb)
        .transform(cut)
    )
    bands = store.select(
        "vec_id", "label", F.explode("bands").alias("bb")
    ).select("vec_id", "label", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    qb = bands.filter(F.col("vec_id") % QUERY_MOD == 0).alias("qa")
    cb = bands.alias("qb")
    cand = (
        qb.join(cb, (F.col("qa.band") == F.col("qb.band"))
                & (F.col("qa.bucket") == F.col("qb.bucket"))
                & (F.col("qa.label") != F.col("qb.label")))
        .select(
            F.col("qa.vec_id").alias("query_id"),
            F.col("qa.label").alias("query_label"),
            F.col("qb.vec_id").alias("neighbor_id"),
            F.col("qb.label").alias("neg_label"),
        )
        .distinct()
    )
    vecs = store.select("vec_id", "embedding", "norm")
    pairs = (
        cand.join(vecs.alias("a"),
                  F.col("query_id") == F.col("a.vec_id"))
        .join(vecs.alias("b"),
              F.col("neighbor_id") == F.col("b.vec_id"))
        .select("query_id", "query_label", "neighbor_id", "neg_label",
                _cos_spark().alias("cosine"))
    )
    return (
        pairs.groupBy("query_id", "query_label")
        .agg(F.min(F.struct(
            (-F.col("cosine")).alias("nc"),
            F.col("neighbor_id").alias("nid"),
            F.col("neg_label").alias("nl"))).alias("t"))
        .select(
            "query_id", "query_label",
            F.col("t.nid").alias("hard_neg_id"),
            F.col("t.nl").alias("neg_label"),
            (-F.col("t.nc")).alias("cosine"),
        )
    )


HARD_NEGATIVE_MINING_SQL = f"""
WITH bands AS ({_bands_union_sql()}),
lbl AS (SELECT vec_id, label FROM embeddings),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, la.label AS query_label,
                  b.vec_id AS neighbor_id, lb.label AS neg_label
  FROM bands a
  JOIN lbl la ON a.vec_id = la.vec_id
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  JOIN lbl lb ON b.vec_id = lb.vec_id AND la.label <> lb.label
  WHERE a.vec_id % {QUERY_MOD} = 0
),
scored AS (
  SELECT query_id, query_label, neighbor_id, neg_label,
         {_COS_SQL} AS cosine
  FROM cand
  JOIN ({_NORM_SQL}) a ON cand.query_id = a.vec_id
  JOIN ({_NORM_SQL}) b ON cand.neighbor_id = b.vec_id
)
SELECT query_id, query_label, neighbor_id AS hard_neg_id, neg_label,
       cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id
    ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored
)
WHERE rn = 1
"""


# ------------------------------------------------------ embedding_margin
MARGIN_TOPK = 20
_NANO = "1000000000.0"
_GRID_EXPR = ("CAST(floor(CAST(x AS DOUBLE) * 1000000000.0 + 0.5) "
              "AS BIGINT)")


def embedding_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-learning margin audit: for each vector, the squared-L2
    distance to its nearest and second-nearest LABEL CENTROID; the
    MARGIN_TOPK smallest-margin vectors are the ambiguous/boundary
    cases a labeling pass reviews first, plus a flag when the nearest
    centroid is not the vector's own label (mislabel candidate).

    Shape: centroids are the semantic_outliers grid-exact per-label
    means (bounded (label, dim) partial agg, collected to arrays);
    the vector scan cross-joins the BROADCAST bounded centroid table
    (|labels| rows — a constant fan-out, not a cartesian blowup);
    nearest-two selection is a sort of a per-vector bounded array;
    the global top-k is TakeOrderedAndProject. Distances are strict
    left-folds, so margins hash identically cross-engine."""
    vecs = spread(load_table(spark, "embeddings", sf_dir))
    dims = vecs.select(
        "label", F.posexplode("embedding").alias("pos", "x"),
    ).select("label", "pos", F.expr(_GRID_EXPR).alias("g"))
    cent = (
        dims.groupBy("label", "pos")
        .agg(F.sum("g").cast("long").alias("s_nano"),
             F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "label", "pos",
            ((F.col("s_nano").cast("double") / F.lit(float(1e9)))
             / F.col("n").cast("double")).alias("c"),
        )
        .groupBy("label")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(pos, c))), "
            "e -> e.c)").alias("centroid"))
        .select(F.col("label").alias("clabel"), "centroid")
    )
    scored = (
        vecs.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "label", "clabel",
            F.expr(V.dist2_expr("embedding", "centroid")).alias("d2"),
        )
    )
    two = (
        scored.groupBy("vec_id", "label")
        .agg(F.expr(
            "slice(array_sort(collect_list(struct(d2, clabel))), 1, 2)"
        ).alias("nn"))
        .select(
            "vec_id", "label",
            F.col("nn")[0]["clabel"].alias("nearest_label"),
            F.col("nn")[0]["d2"].alias("d2_nearest"),
            (F.col("nn")[1]["d2"] - F.col("nn")[0]["d2"])
            .alias("margin"),
        )
    )
    return (
        two.select(
            "vec_id", "label", "nearest_label", "d2_nearest", "margin",
            (F.col("nearest_label") != F.col("label")).cast("long")
            .alias("is_mislabel_candidate"),
        )
        .orderBy(F.asc("margin"), F.asc("vec_id"))
        .limit(MARGIN_TOPK)
    )


EMBEDDING_MARGIN_SQL = f"""
WITH dims AS (
  SELECT label, pos - 1 AS pos,
         CAST(floor(CAST(x AS DOUBLE) * {_NANO} + 0.5) AS BIGINT) AS g
  FROM (SELECT label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
),
cent AS (
  SELECT label AS clabel,
         list((CAST(s_nano AS DOUBLE) / {_NANO})
              / CAST(n AS DOUBLE) ORDER BY pos) AS centroid
  FROM (
    SELECT label, pos, CAST(SUM(g) AS BIGINT) AS s_nano,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dims GROUP BY label, pos
  ) GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label, c.clabel,
         {V.dist2_sql("e.embedding", "c.centroid")} AS d2
  FROM embeddings e CROSS JOIN cent c
),
ranked AS (
  SELECT vec_id, label, clabel, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2 ASC, clabel ASC) AS rn
  FROM scored
),
two AS (
  SELECT a.vec_id, a.label, a.clabel AS nearest_label,
         a.d2 AS d2_nearest, b.d2 - a.d2 AS margin
  FROM ranked a JOIN ranked b
    ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
)
SELECT vec_id, label, nearest_label, d2_nearest, margin,
       CAST(CASE WHEN nearest_label <> label THEN 1 ELSE 0 END
            AS BIGINT) AS is_mislabel_candidate
FROM two
ORDER BY margin ASC, vec_id ASC
LIMIT {MARGIN_TOPK}
"""


QUERIES = {
    "embedding_margin": embedding_margin,
    "stratified_reservoir": stratified_reservoir,
    "dedup_survivorship": dedup_survivorship,
    "tokenizer_oov_rate": tokenizer_oov_rate,
    "hard_negative_mining": hard_negative_mining,
}

ORACLES = {
    "embedding_margin": EMBEDDING_MARGIN_SQL,
    "stratified_reservoir": STRATIFIED_RESERVOIR_SQL,
    "dedup_survivorship": DEDUP_SURVIVORSHIP_SQL,
    "tokenizer_oov_rate": TOKENIZER_OOV_RATE_SQL,
    "hard_negative_mining": HARD_NEGATIVE_MINING_SQL,
}
