"""Curation wave 3: context-window sequence packing and collocation
mining — two more staples of a large-scale training-data pipeline.

Exactness discipline: packing is pure integer arithmetic (cumulative
token offsets, floor division); collocation lift is exact integer
counts with the double arithmetic confined to one fixed-order
expression evaluated identically by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.text import (
    N_TOKENS_SQL,
    TOKENS_SQL,
    n_tokens,
    shingles_from,
    tokens,
)
from distributed_system_mapreduce_spark.tables import load_table
from distributed_system_mapreduce_spark.lineage import cut

# Context-window budget (tokens per packed sequence) and the shard
# fan-out. Packing is inherently sequential *within* a stream, so the
# corpus is split into source x shard streams (shard = doc_id mod 64)
# and packed per stream — 64 shards/source of parallelism here; on a
# real cluster set the shard count ~ executor cores so each stream's
# window sort fits one task. Chunks never span shards by construction.
PACK_BUDGET = 2048
PACK_SHARDS = 64


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing audit: concatenate each
    (source, shard) stream of documents in doc_id order, cut it into
    PACK_BUDGET-token context windows, and report per source how many
    windows the corpus fills and how many documents straddle a window
    boundary (the docs a loss mask would truncate).

    This is the greedy "pack by concatenation" recipe most pretraining
    pipelines use (GPT-style): no bin-packing search, just cumulative
    offsets — which is exactly what makes it expressible as ONE window
    + two partial aggs instead of a driver loop. Windows are
    partitioned (source, shard) — never global; the per-source rollup
    sums shard-level chunk counts (chunks don't cross shards).
    """
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "source",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        "doc_id",
        n_tokens().alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumd = d.select(
        "source", "shard", "n_tok",
        F.sum("n_tok").over(w).alias("cum"),
    )
    marked = cumd.select(
        "source", "shard", "n_tok",
        (
            (F.col("n_tok") > 0)
            & (F.expr(f"(cum - 1) div {PACK_BUDGET}")
               > F.expr(f"(cum - n_tok) div {PACK_BUDGET}"))
        ).cast("long").alias("straddles"),
    )
    per_shard = marked.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("shard_tokens"),
        F.sum("straddles").cast("long").alias("n_straddlers"),
    )
    return per_shard.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("shard_tokens").cast("long").alias("total_tokens"),
        F.sum(
            F.expr(f"(shard_tokens + {PACK_BUDGET - 1}) div {PACK_BUDGET}")
        ).cast("long").alias("n_chunks"),
        F.sum("n_straddlers").cast("long").alias("n_straddlers"),
    )


PACK_CHUNKS_SQL = f"""
WITH d AS (
  SELECT source, doc_id % {PACK_SHARDS} AS shard, doc_id,
         {N_TOKENS_SQL} AS n_tok
  FROM documents
),
marked AS (
  SELECT source, shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
         CASE WHEN n_tok > 0 AND
              (SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - 1)
                // {PACK_BUDGET}
              > (SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tok)
                // {PACK_BUDGET}
         THEN 1 ELSE 0 END AS straddles
  FROM d
),
per_shard AS (
  SELECT source, shard, COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
         CAST(SUM(straddles) AS BIGINT) AS n_straddlers
  FROM marked GROUP BY source, shard
)
SELECT source,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(shard_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM((shard_tokens + {PACK_BUDGET - 1}) // {PACK_BUDGET})
            AS BIGINT) AS n_chunks,
       CAST(SUM(n_straddlers) AS BIGINT) AS n_straddlers
FROM per_shard
GROUP BY source
"""


def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the 30 most frequent word bigrams with
    their LIFT — p(xy) / (p(x) p(y)) — the log-free cousin of PMI
    ("how much more often do these words co-occur than chance").

    Lift instead of PMI on purpose: PMI needs ln(), and libm ln is
    not bit-portable across engines; lift is a ratio of exact integer
    counts, computed as ONE fixed-order double expression, so it
    hashes identically. Plan: ONE corpus scan — each doc explodes its
    unigrams and bigrams through a single Generate (tokenize once,
    kind-tagged terms), one partial-agg shuffle, and the bounded
    vocabulary-scale count table is localCheckpointed before its five
    consumers (totals, top-30, u1, u2) — the per-branch shape
    re-tokenized the corpus five times (r7 scan audit). Top-30
    bigrams picked FIRST (TakeOrderedAndProject, full tie-break) and
    only those 30 rows are broadcast-joined to the unigram table and
    the 1-row totals — the lift arithmetic is O(30), never
    corpus-sized.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(tokens().alias("toks"))
    counted = (
        toks.select(F.explode(F.expr(
            "concat("
            "transform(toks, w -> struct('u' AS kind, w AS term)), "
            f"transform({shingles_from('toks')}, "
            "b -> struct('b' AS kind, b AS term)))"
        )).alias("e"))
        .groupBy("e.kind", "e.term")
        .agg(F.count("*").alias("c"))
        .transform(cut)
    )
    uni = counted.filter(F.col("kind") == "u").select(
        F.col("term").alias("w"), F.col("c").alias("c_w"))
    big = counted.filter(F.col("kind") == "b").select(
        F.col("term").alias("bigram"), F.col("c").alias("c_xy"))
    totals = F.broadcast(
        uni.agg(
            F.sum("c_w").cast("long").alias("n_uni"),
            F.count("*").alias("_vocab"),
        ).crossJoin(
            big.agg(F.sum("c_xy").cast("long").alias("n_bi")))
        .select("n_uni", "n_bi")
    )
    top = F.broadcast(
        big.orderBy(F.desc("c_xy"), "bigram").limit(30).select(
            "bigram", "c_xy",
            F.split("bigram", " ").getItem(0).alias("w1"),
            F.split("bigram", " ").getItem(1).alias("w2"),
        )
    )
    u1, u2 = uni.alias("u1"), uni.alias("u2")
    return (
        top.join(u1, top["w1"] == F.col("u1.w"))
        .join(u2, top["w2"] == F.col("u2.w"))
        .crossJoin(totals)
        .select(
            "bigram", "c_xy",
            F.col("u1.c_w").alias("c_x"),
            F.col("u2.c_w").alias("c_y"),
            F.expr(
                "CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE)"
                " * CAST(n_uni AS DOUBLE)"
                " / (CAST(n_bi AS DOUBLE) * CAST(u1.c_w AS DOUBLE)"
                " * CAST(u2.c_w AS DOUBLE))"
            ).alias("lift"),
        )
    )


BIGRAM_LIFT_SQL = f"""
WITH toks AS (SELECT {TOKENS_SQL} AS toks FROM documents),
uni AS (
  SELECT w, COUNT(*) AS c_w
  FROM (SELECT UNNEST(toks) AS w FROM toks)
  GROUP BY w
),
big AS (
  SELECT bigram, COUNT(*) AS c_xy
  FROM (SELECT UNNEST(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM toks)
  GROUP BY bigram
),
totals AS (
  SELECT (SELECT CAST(SUM(c_w) AS BIGINT) FROM uni) AS n_uni,
         (SELECT CAST(SUM(c_xy) AS BIGINT) FROM big) AS n_bi
),
top AS (
  SELECT bigram, c_xy,
         string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM big
  ORDER BY c_xy DESC, bigram ASC
  LIMIT 30
)
SELECT bigram, c_xy, u1.c_w AS c_x, u2.c_w AS c_y,
       CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE)
         * CAST(n_uni AS DOUBLE)
         / (CAST(n_bi AS DOUBLE) * CAST(u1.c_w AS DOUBLE)
            * CAST(u2.c_w AS DOUBLE)) AS lift
FROM top
JOIN uni u1 ON top.w1 = u1.w
JOIN uni u2 ON top.w2 = u2.w
CROSS JOIN totals
"""


QUERIES = {
    "pack_chunks": pack_chunks,
    "bigram_lift": bigram_lift,
}

ORACLES = {
    "pack_chunks": PACK_CHUNKS_SQL,
    "bigram_lift": BIGRAM_LIFT_SQL,
}


def quality_dup_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal curation analytics: per quality QUARTILE, what
    fraction of documents are exact duplicates — the calibration
    question ("are low-quality docs disproportionately copies?") that
    decides whether dedup should run before or after the quality
    gate.

    Shape: TWO corpus scans — the quality features
    (localCheckpointed: the quartile cutoffs and the final join both
    reference the table, and each replayed the feature regexes
    otherwise) and the md5 pass, whose dup-group count is an
    h-partitioned window instead of a groupBy + self-join (one scan,
    one shuffle; r7 scan audit measured 4 scans in the old shape);
    quartile cutoffs are ONE array-percentile aggregate broadcast
    back (the rfm/concentration pattern — global ranking as threshold
    compares, no window); final rollup is 4 groups. The rate is one
    division of exact ints.
    """
    from pyspark.sql import Window

    from distributed_system_mapreduce_spark.operators.text_analysis import (
        quality_score,
    )

    q = quality_score(spark, sf_dir).select(
        "doc_id", "quality").transform(cut)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.md5("text").alias("h"))
    flagged = docs.select(
        "doc_id",
        (F.count("*").over(Window.partitionBy("h")) > 1)
        .cast("int").alias("is_dup"),
    )
    cuts = F.broadcast(q.agg(
        F.expr("percentile(quality, array(0.25, 0.5, 0.75))").alias("qq")))
    quart = (
        F.lit(1)
        + (F.col("quality") > F.element_at(F.col("qq"), 1)).cast("int")
        + (F.col("quality") > F.element_at(F.col("qq"), 2)).cast("int")
        + (F.col("quality") > F.element_at(F.col("qq"), 3)).cast("int")
    )
    n = F.count("*")
    nd = F.sum("is_dup")
    return (
        q.join(flagged, "doc_id")
        .crossJoin(cuts)
        .select(quart.alias("q_quartile"), "is_dup")
        .groupBy("q_quartile")
        .agg(
            n.alias("n_docs"),
            nd.cast("long").alias("n_dup_docs"),
            (nd.cast("double") / n.cast("double")).alias("dup_rate"),
        )
    )


from distributed_system_mapreduce_spark.operators.text_analysis import (  # noqa: E402,E501
    QUALITY_SCORE_SQL as _QS_SQL,
)

QUALITY_DUP_CORRELATION_SQL = f"""
WITH q AS (SELECT doc_id, quality FROM ({_QS_SQL})),
d AS (SELECT doc_id, md5(text) AS h FROM documents),
grp AS (SELECT h, COUNT(*) AS c FROM d GROUP BY h),
flagged AS (
  SELECT d.doc_id, CAST(grp.c > 1 AS INT) AS is_dup
  FROM d JOIN grp ON d.h = grp.h
),
cuts AS (
  SELECT quantile_cont(quality, 0.25) AS t1,
         quantile_cont(quality, 0.5) AS t2,
         quantile_cont(quality, 0.75) AS t3
  FROM q
)
SELECT 1 + CAST(quality > t1 AS INT) + CAST(quality > t2 AS INT)
         + CAST(quality > t3 AS INT) AS q_quartile,
       COUNT(*) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
       CAST(SUM(is_dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM q JOIN flagged USING (doc_id) CROSS JOIN cuts
GROUP BY 1
"""

QUERIES["quality_dup_correlation"] = quality_dup_correlation
ORACLES["quality_dup_correlation"] = QUALITY_DUP_CORRELATION_SQL
