"""Curation wave 5: asymmetric near-dup, embedding outliers, vocab
head census.

- minhash_containment : containment similarity |A∩B| / |A| over the
                        LSH candidate pairs — catches near-SUPERSET
                        duplication (a doc embedded inside a larger
                        one) that symmetric Jaccard under-scores;
                        the RealNews/C4-style containment dedup pass.
- semantic_outliers   : per-label embedding centroid + the top-5
                        farthest members — the "wrong cluster /
                        mislabeled vector" audit run before trusting
                        labels for curriculum mixing.
- token_rank_curve    : the head of the corpus unigram distribution
                        (top 50 tokens) with rank and cumulative
                        mass share — the Zipf head census that sizes
                        stopword lists and tokenizer vocab floors.

Reference parity: SURVEY §2.D extensions; each would be a
maple+juice pair in the reference (per-key reduce granularity,
/root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.functions.vectors import (
    dist2_expr,
    dist2_sql,
)
from distributed_system_mapreduce_spark.operators.dedup import (
    DEDUP_MINHASH_SQL,
    _SHINGLE_SQL,
)
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

CONTAIN_TAU = 0.5


# -------------------------------------------------- minhash_containment
def minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-scored near-dup pairs: for every LSH candidate
    pair, |A∩B|/|A| and |A∩B|/|B| over distinct word-bigram shingle
    sets, kept when either direction >= CONTAIN_TAU. High containment
    with modest Jaccard is the quote/embedding/boilerplate-inclusion
    signature symmetric dedup misses.

    Shape: pairwise work only inside LSH buckets (never all-pairs,
    same posture as dedup_ngram_jaccard); the intersection is an
    array_intersect over two per-doc shingle arrays joined onto the
    candidate list — no shingle-level equi-join explosion. ONE
    tokenize+explode+groupBy pass produces both the minhash columns
    and the shingle arrays (the dedup_ngram_jaccard shared store —
    composing dedup_minhash + _doc_shingles re-shingles the corpus
    twice). Integer set sizes; fixed-order double divisions."""
    from distributed_system_mapreduce_spark.operators.dedup import (
        N_HASHES,
        _bands_from,
        _candidates_from,
        _shingle_df,
    )

    sh = _shingle_df(spark, sf_dir)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"mh{i}")
        for i in range(N_HASHES)
    ] + [F.collect_list("s").alias("sh")]
    store = sh.groupBy("doc_id").agg(*aggs).transform(cut)
    cand = _candidates_from(_bands_from(store)).select("doc_a", "doc_b")
    ds = store.select("doc_id", "sh")
    pairs = (
        cand.join(ds.alias("da"), F.col("doc_a") == F.col("da.doc_id"))
        .join(ds.alias("db"), F.col("doc_b") == F.col("db.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect(F.col("da.sh"), F.col("db.sh")))
            .cast("long").alias("inter"),
            F.size("da.sh").cast("long").alias("na"),
            F.size("db.sh").cast("long").alias("nb"),
        )
    )
    cont_a = F.col("inter").cast("double") / F.col("na").cast("double")
    cont_b = F.col("inter").cast("double") / F.col("nb").cast("double")
    return (
        pairs.select(
            "doc_a", "doc_b", "inter", "na", "nb",
            cont_a.alias("cont_a"), cont_b.alias("cont_b"),
        )
        .filter(F.greatest(F.col("cont_a"), F.col("cont_b"))
                >= CONTAIN_TAU)
    )


MINHASH_CONTAINMENT_SQL = f"""
WITH cand AS (
  SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_SQL})
),
sh AS ({_SHINGLE_SQL}),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT doc_a, doc_b, COUNT(*) AS inter
  FROM cand
  JOIN sh sa ON sa.doc_id = doc_a
  JOIN sh sb ON sb.doc_id = doc_b AND sa.s = sb.s
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, inter, ca.n AS na, cb.n AS nb,
       CAST(inter AS DOUBLE) / CAST(ca.n AS DOUBLE) AS cont_a,
       CAST(inter AS DOUBLE) / CAST(cb.n AS DOUBLE) AS cont_b
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE greatest(CAST(inter AS DOUBLE) / CAST(ca.n AS DOUBLE),
               CAST(inter AS DOUBLE) / CAST(cb.n AS DOUBLE))
      >= {CONTAIN_TAU}
"""


# ---------------------------------------------------- semantic_outliers
OUTLIER_TOPK = 5
_NANO = "1000000000.0"
_GRID_EXPR = ("CAST(floor(CAST(x AS DOUBLE) * 1000000000.0 + 0.5) "
              "AS BIGINT)")


def semantic_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + the OUTLIER_TOPK members farthest from it
    (squared L2) — the label-noise / cluster-impurity audit: vectors
    that sit far from their own label's mass are mislabel or
    off-distribution candidates (the SemDeDup/label-QA companion).

    Shape: centroids via posexplode -> one partial-agg shuffle on the
    BOUNDED (label, dim) key -> collected into a per-label array
    (labels x 64 rows); centroids broadcast back onto an un-shuffled
    vector scan; top-k per label via a window over the label
    partition (bounded group count; the per-group heap is the
    quality_topk_per_group posture). Cross-engine exactness: per-dim
    means are 1e-9-grid exact BIGINT sums with the (sum/1e9)/n
    fixed-order division (embedding_quantize idiom); the distance is
    the strict left-fold dist2 in double, so values hash-identically."""
    vecs = spread(load_table(spark, "embeddings", sf_dir))
    dims = vecs.select(
        "label", F.posexplode("embedding").alias("pos", "x"),
    ).select("label", "pos", F.expr(_GRID_EXPR).alias("g"))
    per_dim = dims.groupBy("label", "pos").agg(
        F.sum("g").cast("long").alias("s_nano"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cent = (
        per_dim.select(
            "label", "pos",
            ((F.col("s_nano").cast("double") / F.lit(float(1e9)))
             / F.col("n").cast("double")).alias("c"),
        )
        .groupBy("label")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(pos, c))), "
            "e -> e.c)").alias("centroid"))
    )
    scored = (
        vecs.join(F.broadcast(cent), "label")
        .select(
            "label", "vec_id",
            F.expr(dist2_expr("embedding", "centroid")).alias("dist2"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("dist2"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= OUTLIER_TOPK)
        .select("label", "rk", "vec_id", "dist2")
    )


SEMANTIC_OUTLIERS_SQL = f"""
WITH dims AS (
  SELECT label, pos - 1 AS pos,
         CAST(floor(CAST(x AS DOUBLE) * {_NANO} + 0.5) AS BIGINT) AS g
  FROM (SELECT label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
),
per_dim AS (
  SELECT label, pos, CAST(SUM(g) AS BIGINT) AS s_nano,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM dims GROUP BY label, pos
),
cent AS (
  SELECT label,
         list((CAST(s_nano AS DOUBLE) / {_NANO})
              / CAST(n AS DOUBLE) ORDER BY pos) AS centroid
  FROM per_dim GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id,
         {dist2_sql("e.embedding", "c.centroid")} AS dist2
  FROM embeddings e JOIN cent c ON e.label = c.label
)
SELECT label, rk, vec_id, dist2 FROM (
  SELECT label, vec_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY dist2 DESC, vec_id ASC) AS rk
  FROM scored
)
WHERE rk <= {OUTLIER_TOPK}
"""


# ----------------------------------------------------- token_rank_curve
CURVE_TOPK = 50


def token_rank_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Zipf head: the CURVE_TOPK most frequent corpus tokens with
    rank, count, corpus share, and CUMULATIVE share — the curve that
    decides how much mass a stopword list or a tokenizer's top-vocab
    actually covers.

    Shape: one map-side-combined token count shuffle to the
    vocab-scale count table (localCheckpointed — the corpus total
    and both sides of the triangular head join reference it, each
    re-tokenizing the corpus otherwise; r7 scan audit: 3 scans, now
    1), global top-k as TakeOrderedAndProject (never a global sort),
    then rank + prefix sum over the BOUNDED 50-row head via the
    broadcast triangular self-join (the triangular_cumsum discipline
    — no single-partition window); the corpus total is a broadcast
    1-row aggregate. Counts are exact BIGINTs; shares are
    fixed-order double divisions."""
    docs = load_table(spark, "documents", sf_dir)
    counts = (
        docs.select(F.explode(X.tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(cut)
    )
    total = F.broadcast(
        counts.agg(F.sum("cnt").cast("long").alias("total")))
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(CURVE_TOPK)
    a, b = top.alias("a"), F.broadcast(top.alias("b"))
    prec = (F.col("b.cnt") > F.col("a.cnt")) | (
        (F.col("b.cnt") == F.col("a.cnt"))
        & (F.col("b.token") <= F.col("a.token")))
    ranked = (
        a.join(b, prec)
        .groupBy(F.col("a.token").alias("token"),
                 F.col("a.cnt").alias("cnt"))
        .agg(F.count(F.lit(1)).cast("long").alias("rank"),
             F.sum("b.cnt").cast("long").alias("cum_cnt"))
    )
    return (
        ranked.crossJoin(total)
        .select(
            "rank", "token", "cnt",
            (F.col("cnt").cast("double")
             / F.col("total").cast("double")).alias("share"),
            (F.col("cum_cnt").cast("double")
             / F.col("total").cast("double")).alias("cum_share"),
        )
    )


TOKEN_RANK_CURVE_SQL = f"""
WITH counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({X.TOKENS_SQL}) AS token FROM documents)
  GROUP BY token
),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
top AS (
  SELECT token, cnt FROM counts
  ORDER BY cnt DESC, token ASC LIMIT {CURVE_TOPK}
),
ranked AS (
  SELECT a.token, a.cnt,
         CAST(COUNT(*) AS BIGINT) AS rank,
         CAST(SUM(b.cnt) AS BIGINT) AS cum_cnt
  FROM top a JOIN top b
    ON b.cnt > a.cnt OR (b.cnt = a.cnt AND b.token <= a.token)
  GROUP BY a.token, a.cnt
)
SELECT rank, token, cnt,
       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       CAST(cum_cnt AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
FROM ranked CROSS JOIN total
"""


# ------------------------------------------------------- ngram_novelty
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source novelty: per source, the fraction of its distinct
    word-bigram shingles that appear in NO other source — the
    diversity-vs-redundancy signal that prices a new source into a
    training mix (a source whose n-grams all exist elsewhere adds
    volume, not coverage).

    Shape: the exploded shingle table joins the (doc_id, source) map
    on doc_id (shuffle), reduces to distinct (shingle, source) — one
    partial-agg shuffle keyed by the shingle — localCheckpointed:
    the per-shingle source cardinality and the per-source census
    both reference it, and each replayed the shingle explode + join
    + distinct otherwise (r7 scan audit: 4 scans, now 1). Then a
    bounded per-source census. All counts exact BIGINTs; one double
    division at output. Linear in corpus shingles; no pairwise
    source comparison anywhere."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source")
    sh = _shingle_src(spark, sf_dir, docs).transform(cut)
    per_sh = sh.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_sources"))
    return (
        sh.join(per_sh, "s")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("n_sources") == 1).cast("long"))
            .cast("long").alias("n_unique"),
        )
        .select(
            "source", "n_shingles", "n_unique",
            (F.col("n_unique").cast("double")
             / F.col("n_shingles").cast("double")).alias("novelty"),
        )
    )


def _shingle_src(spark: SparkSession, sf_dir: str,
                 docs: DataFrame) -> DataFrame:
    """Distinct (shingle, source) pairs for the whole corpus."""
    from distributed_system_mapreduce_spark.operators.dedup import (
        _shingle_df,
    )

    return (
        _shingle_df(spark, sf_dir)
        .join(docs, "doc_id")
        .select("s", "source")
        .distinct()
    )


NGRAM_NOVELTY_SQL = f"""
WITH sh AS (
  SELECT DISTINCT t.s, d.source
  FROM ({_SHINGLE_SQL}) t JOIN documents d ON t.doc_id = d.doc_id
),
per_sh AS (SELECT s, COUNT(*) AS n_sources FROM sh GROUP BY s)
SELECT sh.source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM sh JOIN per_sh ON sh.s = per_sh.s
GROUP BY sh.source
"""


# ------------------------------------------------------- split_ks_check
def split_ks_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-integrity audit: the Kolmogorov-Smirnov statistic between
    the doc-length (n_chars) distributions of the TRAIN bucket and
    the held-out (val+test) bucket under train_val_split's hash wall
    — a large KS means the 'random' wall correlates with content and
    the eval set is biased.

    Shape: one partial-agg shuffle to the BOUNDED distinct-length
    table with per-bucket counts — localCheckpointed: both sides of
    the triangular prefix join and the totals reference it, and each
    replayed the documents scan otherwise (r7 scan audit: 3 scans,
    now 1) — prefix sums via the broadcast triangular self-join
    (triangular_cumsum discipline — lengths are bounded, so
    O(levels²) fan-out is fine), then a 1-row argmax via
    min(struct). Exactness: the KS sup is taken over the exact
    integer |cum_t·N_h − cum_h·N_t| (ties broken to the smallest
    length), divided by N_t·N_h once at output. The BIGINT products
    stay under 2^53 up to ~9e7 docs per side; widen to DECIMAL(38,0)
    beyond (events_twap discipline)."""
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    lv = (
        docs.select(
            F.col("n_chars").alias("v"),
            (bucket < "cc").alias("is_train"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.col("is_train").cast("long")).alias("ct"),
            F.sum((~F.col("is_train")).cast("long")).alias("ch"),
        )
        .transform(cut)
    )
    b = F.broadcast(lv.select(F.col("v").alias("bv"),
                              F.col("ct").alias("bct"),
                              F.col("ch").alias("bch")))
    cum = (
        lv.join(b, F.col("bv") <= F.col("v"))
        .groupBy("v")
        .agg(F.sum("bct").cast("long").alias("cum_t"),
             F.sum("bch").cast("long").alias("cum_h"))
    )
    tot = F.broadcast(lv.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("ch").cast("long").alias("nh")))
    scaled = cum.crossJoin(tot).select(
        "nt", "nh",
        F.abs(F.col("cum_t") * F.col("nh")
              - F.col("cum_h") * F.col("nt")).alias("d"),
        "v",
    )
    top = scaled.groupBy("nt", "nh").agg(
        F.min(F.struct((-F.col("d")).alias("nd"), F.col("v")))
        .alias("t"))
    return top.select(
        F.col("nt").alias("n_train"),
        F.col("nh").alias("n_holdout"),
        ((-F.col("t.nd")).cast("double")
         / (F.col("nt").cast("double") * F.col("nh").cast("double")))
        .alias("ks"),
        F.col("t.v").alias("ks_at_length"),
    )


SPLIT_KS_CHECK_SQL = """
WITH lv AS (
  SELECT n_chars AS v,
         SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                  < 'cc' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                  < 'cc' THEN 0 ELSE 1 END) AS ch
  FROM documents GROUP BY n_chars
),
cum AS (
  SELECT a.v,
         CAST(SUM(b.ct) AS BIGINT) AS cum_t,
         CAST(SUM(b.ch) AS BIGINT) AS cum_h
  FROM lv a JOIN lv b ON b.v <= a.v
  GROUP BY a.v
),
tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(ch) AS BIGINT) AS nh
  FROM lv
),
scaled AS (
  SELECT nt, nh, abs(cum_t * nh - cum_h * nt) AS d, v
  FROM cum CROSS JOIN tot
)
SELECT nt AS n_train, nh AS n_holdout,
       CAST(d AS DOUBLE)
         / (CAST(nt AS DOUBLE) * CAST(nh AS DOUBLE)) AS ks,
       v AS ks_at_length
FROM scaled
ORDER BY d DESC, v ASC LIMIT 1
"""


QUERIES = {
    "minhash_containment": minhash_containment,
    "semantic_outliers": semantic_outliers,
    "token_rank_curve": token_rank_curve,
    "ngram_novelty": ngram_novelty,
    "split_ks_check": split_ks_check,
}

ORACLES = {
    "minhash_containment": MINHASH_CONTAINMENT_SQL,
    "semantic_outliers": SEMANTIC_OUTLIERS_SQL,
    "token_rank_curve": TOKEN_RANK_CURVE_SQL,
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "split_ks_check": SPLIT_KS_CHECK_SQL,
}
