"""Corpus QA + retrieval-evaluation primitives, wave 13:

- retrieval_pr_eval     : precision / recall / F1 @ k of bm25_rank's
                          top-20 against the term-coverage gold label
                          — the set-based complement of ndcg_eval's
                          graded metric; together they make retrieval
                          changes regression-testable from both views.
- skipgram_lift         : top-30 within-window (w=4) token
                          co-occurrence pairs by LIFT — collocation
                          mining beyond bigram_lift's adjacent pairs,
                          the skip-gram statistic behind phrase
                          detection and embedding co-occurrence
                          matrices.
- source_length_moments : per-source mean / variance / skewness of
                          document length from EXACT integer power
                          sums — the corpus-shape audit that catches
                          a source whose length distribution shifted
                          between crawls.
- dataset_card          : the one-row dataset card a corpus release
                          ships with — doc/source/lang counts, char
                          and token totals, exact-duplicate rate, and
                          the exact median document length.

Exactness: counts and power sums are BIGINT / DECIMAL(38,0)
accumulators (order-independent); lift and the moment statistics are
single fixed-order double expressions over those exact integers (the
bigram_lift discipline — no ln, no engine-specific medians); the
dataset-card median comes from a sorted fold over the bounded
distinct-length grid with the accumulator fields ordered so DuckDB's
sequential-mutation list_reduce and Spark's snapshotting aggregate()
agree.

Scale shape (100 TB): retrieval_pr_eval joins the bounded 20-row
ranking against raw docs (labels tokenize 20 docs) plus ONE corpus
label pass for the recall denominator; skipgram pairs explode with a
constant w-fold fan-out into a map-side-combined count, top-30 picked
FIRST (TakeOrderedAndProject) and only those rows join the broadcast
unigram/total tables; source_length_moments is one partial agg;
dataset_card is two corpus scans (multi-distinct agg + length grid)
with a bounded fold. No windows anywhere; driver state zero.

Reference parity: extends the reference's aggregation surface
(maple_juice.go juice semantics) with the corpus-QA reducers its
users run downstream; semantics per the standard IR / statistics
literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.operators.curation import (
    BM25_QUERY,
    BM25_RANK_SQL,
    bm25_rank,
)
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

# ------------------------------------------------------ retrieval_pr_eval
PR_CUTS = (5, 10, 20)
REL_MIN = 2  # relevant = doc contains >= REL_MIN distinct query terms


def retrieval_pr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P@k / R@k / F1@k (k in PR_CUTS) of bm25_rank's top-20 under
    the binary gold label rel(doc) = [>= REL_MIN distinct query terms
    present]. All cutoffs come from ONE conditional aggregation over
    the 20-row ranking (the ndcg_eval shape) crossed with the 1-row
    corpus relevant-count; F1 = 0 when P + R = 0 by the usual
    convention, spelled as the identical CASE in both engines."""
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    rel_expr = (f"size(array_intersect(array_distinct({X.TOKENS_EXPR}), "
                f"array({terms}))) >= {REL_MIN}")
    docs = spread(load_table(spark, "documents", sf_dir))
    # gold labels for the 20 ranked docs only: join first, tokenize 20
    ranked = (
        F.broadcast(
            bm25_rank(spark, sf_dir)
            .select("doc_id", F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
                .alias("pos")))
        .join(docs, "doc_id")
        .select("pos", F.expr(rel_expr).cast("long").alias("rel"))
    )
    hits = ranked.groupBy().agg(*[
        F.sum(F.when(F.col("pos") <= k, F.col("rel")).otherwise(0))
        .cast("long").alias(f"hits{k}")
        for k in PR_CUTS
    ])
    n_rel = docs.select(F.expr(rel_expr).cast("long").alias("r")) \
        .groupBy().agg(F.sum("r").cast("long").alias("n_rel"))
    wide = hits.crossJoin(F.broadcast(n_rel))
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), hits{k}" for k in PR_CUTS)
    return (
        wide.select(
            "n_rel",
            F.expr(f"stack({len(PR_CUTS)}, {stack_args}) AS (k, hits)"))
        .selectExpr(
            "k", "hits", "n_rel",
            "CAST(hits AS DOUBLE) / k AS precision",
            # NULL guard spelled identically in both engines: with
            # ANSI off Spark yields NULL on /0 while DuckDB yields
            # inf/NaN — the cross-engine divergence class the
            # token_js_divergence fix established
            "CASE WHEN n_rel = 0 THEN CAST(NULL AS DOUBLE) "
            "ELSE CAST(hits AS DOUBLE) / n_rel END AS recall",
            "CASE WHEN hits = 0 THEN CAST(0 AS DOUBLE) ELSE "
            "2.0 * (CAST(hits AS DOUBLE) / k) * (CAST(hits AS DOUBLE)"
            " / n_rel) / (CAST(hits AS DOUBLE) / k "
            "+ CAST(hits AS DOUBLE) / n_rel) END AS f1",
        )
    )


def _pr_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    rel = (f"(len(list_intersect(list_distinct({X.TOKENS_SQL}), "
           f"[{terms}])) >= {REL_MIN})")
    hit_cols = ", ".join(
        f"SUM(CASE WHEN pos <= {k} THEN rel ELSE 0 END) AS hits{k}"
        for k in PR_CUTS)
    cuts = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS k, CAST(hits{k} AS BIGINT) "
        f"AS hits, n_rel FROM wide" for k in PR_CUTS)
    return f"""
WITH bm AS ({BM25_RANK_SQL}),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY bm25 DESC, bm.doc_id ASC) AS pos,
         CAST({rel} AS BIGINT) AS rel
  FROM bm JOIN documents d ON bm.doc_id = d.doc_id
),
hits AS (SELECT {hit_cols} FROM ranked),
nrel AS (
  SELECT CAST(SUM(CAST({rel} AS BIGINT)) AS BIGINT) AS n_rel
  FROM documents
),
wide AS (SELECT * FROM hits CROSS JOIN nrel)
SELECT k, hits, n_rel,
       CAST(hits AS DOUBLE) / k AS precision,
       CASE WHEN n_rel = 0 THEN CAST(NULL AS DOUBLE)
       ELSE CAST(hits AS DOUBLE) / n_rel END AS recall,
       CASE WHEN hits = 0 THEN CAST(0 AS DOUBLE) ELSE
       2.0 * (CAST(hits AS DOUBLE) / k) * (CAST(hits AS DOUBLE)
       / n_rel) / (CAST(hits AS DOUBLE) / k
       + CAST(hits AS DOUBLE) / n_rel) END AS f1
FROM ({cuts})
"""


# ---------------------------------------------------------- skipgram_lift
SKIP_W = 4     # co-occurrence window: pairs (t[i], t[j]), i < j <= i+W
SKIP_TOPK = 30

# The in-array pair generator over the materialized `t` tokens column
# (constant w-fold fan-out, no self join). Module-level so the plan
# test exercises THIS expression, not a copy that can drift.
SKIPGRAM_PAIR_EXPR = (
    "CASE WHEN size(t) < 2 THEN "
    "CAST(array() AS array<struct<a:string,b:string>>) ELSE "
    "flatten(transform(sequence(1, size(t) - 1), "
    f"i -> transform(slice(t, i + 1, {SKIP_W}), "
    "x -> struct(element_at(t, i) AS a, x AS b)))) END"
)


def skipgram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 within-window ordered token pairs by frequency, with
    their LIFT = p(a,b) / (p(a) p(b)) over the skip-gram event space
    — collocation mining with the window w=4 co-occurrence statistic
    (word2vec's context shape) instead of bigram_lift's adjacency.

    Lift, not PMI, for the same reason as bigram_lift: it is one
    fixed-order double expression over exact integer counts (all
    products done in doubles — the lang_source_pmi overflow lesson).
    Plan: ONE corpus scan — pair generation is an in-array transform
    over the materialized tokens column (constant w-fold fan-out, no
    self join) concatenated with the NULL-tagged unigram structs so
    both count tables come out of a single Generate + one
    map-side-combined shuffle (the two-branch shape re-tokenized the
    corpus five times — r7 scan audit); the bounded count table is
    localCheckpointed before its five consumers. Top-30 FIRST
    (TakeOrderedAndProject with full tie-break), then broadcast
    unigram counts + 1-row totals onto 30 rows."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select(F.expr(X.TOKENS_EXPR).alias("t"))
    counted = (
        toks.select(F.explode(F.expr(
            "concat(transform(t, x -> struct(x AS a, "
            f"CAST(NULL AS STRING) AS b)), {SKIPGRAM_PAIR_EXPR})"
        )).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b").agg(F.count("*").alias("c"))
        .transform(cut)
    )
    pairs = counted.filter(F.col("b").isNotNull())
    uni = counted.filter(F.col("b").isNull()).select(
        F.col("a").alias("tok"), F.col("c").alias("cu"))
    tot = pairs.groupBy().agg(F.sum("c").cast("long").alias("np")) \
        .crossJoin(uni.groupBy().agg(
            F.sum("cu").cast("long").alias("nt")))
    top = (
        pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
        .limit(SKIP_TOPK)
    )
    return (
        top.join(F.broadcast(uni.withColumnRenamed("tok", "a")
                             .withColumnRenamed("cu", "ca")), "a")
        .join(F.broadcast(uni.withColumnRenamed("tok", "b")
                          .withColumnRenamed("cu", "cb")), "b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "a", "b", "CAST(c AS BIGINT) AS n_pair",
            "CAST(ca AS BIGINT) AS n_a", "CAST(cb AS BIGINT) AS n_b",
            "CAST(c AS DOUBLE) * nt * nt / "
            "(CAST(np AS DOUBLE) * ca * cb) AS lift",
        )
    )


SKIPGRAM_LIFT_SQL = f"""
WITH toks AS (SELECT {X.TOKENS_SQL} AS t FROM documents),
pair_rows AS (
  SELECT unnest(CASE WHEN len(t) < 2 THEN [] ELSE
    flatten(list_transform(range(1, len(t)),
      i -> list_transform(t[i + 1 : least(i + {SKIP_W}, len(t))],
           x -> {{'a': t[i], 'b': x}})))
  END) AS p
  FROM toks
),
pairs AS (
  SELECT p.a AS a, p.b AS b, COUNT(*) AS c
  FROM pair_rows GROUP BY 1, 2
),
uni AS (
  SELECT unnest(t) AS tok FROM toks
),
unic AS (SELECT tok, COUNT(*) AS cu FROM uni GROUP BY tok),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM pairs) AS np,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS nt
),
top AS (
  SELECT a, b, c FROM pairs ORDER BY c DESC, a ASC, b ASC
  LIMIT {SKIP_TOPK}
)
SELECT a, b, CAST(c AS BIGINT) AS n_pair,
       CAST(ua.cu AS BIGINT) AS n_a, CAST(ub.cu AS BIGINT) AS n_b,
       CAST(c AS DOUBLE) * nt * nt /
       (CAST(np AS DOUBLE) * ua.cu * ub.cu) AS lift
FROM top
JOIN unic ua ON top.a = ua.tok
JOIN unic ub ON top.b = ub.tok
CROSS JOIN tot
"""


# -------------------------------------------------- source_length_moments
def source_length_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-distribution shape: population mean,
    variance, and skewness of n_chars from EXACT integer power sums
    (s1 BIGINT; s2, s3 DECIMAL(38,0) — n_chars^3 clears int64 at
    ~2e6-char docs). The final statistics are single fixed-order
    double expressions; skewness is NULL (identically, both engines)
    for degenerate zero-variance sources. One partial-agg shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    lc = F.col("n_chars").cast("long")
    agg = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(lc.cast("decimal(38,0)")).alias("s1"),
        F.sum((lc * lc).cast("decimal(38,0)")).alias("s2"),
        F.sum((lc * lc * lc).cast("decimal(38,0)")).alias("s3"),
    )
    return agg.selectExpr(
        "source", "n",
        "CAST(s1 AS DOUBLE) / n AS mean_chars",
        "CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s1 AS DOUBLE) / n) AS var_chars",
        # skew = (m3 - 3 mean m2 + 2 mean^3) / var^1.5, all from the
        # same exact sums; var * sqrt(var) keeps sqrt correctly
        # rounded (no pow())
        "CASE WHEN CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s1 AS DOUBLE) / n) <= 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE (CAST(s3 AS DOUBLE) / n"
        " - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)"
        " + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s1 AS DOUBLE) / n))"
        " / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s1 AS DOUBLE) / n)) * sqrt(CAST(s2 AS DOUBLE) / n"
        " - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))"
        " END AS skew_chars",
    )


SOURCE_LENGTH_MOMENTS_SQL = """
WITH agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0))
           AS s1,
         CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS s2,
         CAST(SUM(CAST(n_chars * n_chars * n_chars AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS s3
  FROM documents GROUP BY source
)
SELECT source, n,
       CAST(s1 AS DOUBLE) / n AS mean_chars,
       CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
         * (CAST(s1 AS DOUBLE) / n) AS var_chars,
       CASE WHEN CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
         * (CAST(s1 AS DOUBLE) / n) <= 0 THEN CAST(NULL AS DOUBLE)
         ELSE (CAST(s3 AS DOUBLE) / n
         - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
         + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
         * (CAST(s1 AS DOUBLE) / n))
         / ((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
         * (CAST(s1 AS DOUBLE) / n)) * sqrt(CAST(s2 AS DOUBLE) / n
         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
         END AS skew_chars
FROM agg
"""


# ------------------------------------------------------------ dataset_card
def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card a corpus release ships with: document
    / source / language counts, char and whitespace-token totals, the
    exact-duplicate rate (1 - distinct md5(text) / n_docs — the
    dedup_exact statistic as a scalar), and the exact LOWER-MEDIAN
    document length.

    The median comes from a sorted fold over the bounded
    distinct-length grid (one partial-agg shuffle onto the grid, one
    bounded collect): accumulator fields are ordered {med, cum} so
    DuckDB's sequential-mutation list_reduce and Spark's snapshotting
    aggregate() compute the identical result (med reads only the
    pre-update cum). Two corpus scans total; no windows."""
    docs = spread(load_table(spark, "documents", sf_dir))
    base = docs.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct(F.md5("text")).cast("long")
        .alias("n_distinct_texts"),
        F.sum(F.col("n_chars").cast("long")).cast("long")
        .alias("total_chars"),
        F.sum(X.n_tokens().cast("long")).cast("long")
        .alias("total_tokens"),
    )
    grid = (
        docs.groupBy(F.col("n_chars").cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy()
        .agg(F.expr("sort_array(collect_list(struct(v, c)))")
             .alias("g"))
    )
    fold = (
        "aggregate(g, "
        "struct(CAST(NULL AS BIGINT) AS med, CAST(0 AS BIGINT) AS cum), "
        "(acc, s) -> struct("
        "CASE WHEN acc.med IS NOT NULL THEN acc.med "
        "WHEN acc.cum + s.c >= (n_docs + 1) DIV 2 THEN s.v END AS med, "
        "acc.cum + s.c AS cum), "
        "acc -> acc.med)"
    )
    return (
        base.crossJoin(F.broadcast(grid))
        .selectExpr(
            "n_docs", "n_sources", "n_langs", "total_chars",
            "total_tokens", "n_distinct_texts",
            "1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs"
            " AS exact_dup_rate",
            f"{fold} AS median_chars",
        )
    )


DATASET_CARD_SQL = """
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM({ntok}) AS BIGINT) AS total_tokens
  FROM documents
),
grid AS (
  SELECT list_sort(list({{'v': v, 'c': c}})) AS g FROM (
    SELECT CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1
  )
)
SELECT n_docs, n_sources, n_langs, total_chars, total_tokens,
       n_distinct_texts,
       1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs
         AS exact_dup_rate,
       list_reduce(
         list_prepend({{'med': CAST(NULL AS BIGINT),
                        'cum': CAST(0 AS BIGINT)}},
                      list_transform(g, s ->
                        {{'med': s.v, 'cum': s.c}})),
         (acc, s) -> {{'med': CASE WHEN acc.med IS NOT NULL
                         THEN acc.med
                         WHEN acc.cum + s.cum >= (n_docs + 1) // 2
                         THEN s.med END,
                       'cum': acc.cum + s.cum}}).med AS median_chars
FROM base CROSS JOIN grid
""".format(ntok=X.N_TOKENS_SQL)


QUERIES = {
    "retrieval_pr_eval": retrieval_pr_eval,
    "skipgram_lift": skipgram_lift,
    "source_length_moments": source_length_moments,
    "dataset_card": dataset_card,
}

ORACLES = {
    "retrieval_pr_eval": _pr_sql(),
    "skipgram_lift": SKIPGRAM_LIFT_SQL,
    "source_length_moments": SOURCE_LENGTH_MOMENTS_SQL,
    "dataset_card": DATASET_CARD_SQL,
}


# --------------------------------------------------------- rank_tau_eval
def rank_tau_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between the BM25 and linear-TF-IDF rankings of
    the anchor query, over the documents BOTH top-20 lists contain —
    the ranker-agreement scalar that tells a retrieval owner whether
    a scorer swap actually reorders results or just rescales them
    (the rank-correlation complement of ndcg_eval's gold-referenced
    view and retrieval_pr_eval's set view).

    Exact integers end to end: concordant/discordant counts come
    from the <= 20x20/2 pair join of two bounded rank heads (raw
    ranks — only order matters, and both rankings are tie-free by
    their full tie-breaks); tau = (C - D) / (n(n-1)/2), NULL when
    fewer than 2 common docs (identical CASE both engines)."""
    from distributed_system_mapreduce_spark.operators.curation import (
        bm25_ranked,
        tfidf_ranked,
    )

    common = (
        bm25_ranked(spark, sf_dir)
        .join(tfidf_ranked(spark, sf_dir), "doc_id")
        .transform(cut)  # <= 20 rows; both pair-join sides reuse it
    )
    a, b = common.alias("a"), common.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        ((F.col("a.rank_bm25") - F.col("b.rank_bm25"))
         * (F.col("a.rank_tfidf") - F.col("b.rank_tfidf")) > 0)
        .cast("long").alias("conc"))
    counts = common.groupBy().agg(
        F.count("*").cast("long").alias("n_common"))
    folded = pairs.groupBy().agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
    )
    return (
        counts.crossJoin(folded)
        .selectExpr(
            "n_common", "n_pairs", "concordant",
            "n_pairs - concordant AS discordant",
            "CASE WHEN n_pairs = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            "(CAST(concordant AS DOUBLE) - (n_pairs - concordant))"
            " / n_pairs END AS kendall_tau",
        )
    )


def _rank_tau_sql() -> str:
    from distributed_system_mapreduce_spark.operators.curation import (
        RANKED_HEADS_CTES,
    )

    return f"""
WITH {RANKED_HEADS_CTES},
common AS (
  SELECT bm.doc_id, rank_bm25, rank_tfidf
  FROM bm JOIN ti ON bm.doc_id = ti.doc_id
),
pairs AS (
  SELECT CASE WHEN (a.rank_bm25 - b.rank_bm25)
                 * (a.rank_tfidf - b.rank_tfidf) > 0
              THEN 1 ELSE 0 END AS conc
  FROM common a JOIN common b ON a.doc_id < b.doc_id
),
counts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM common),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(conc) AS BIGINT) AS concordant
  FROM pairs
)
SELECT n_common, n_pairs, concordant,
       n_pairs - concordant AS discordant,
       CASE WHEN n_pairs = 0 THEN CAST(NULL AS DOUBLE) ELSE
       (CAST(concordant AS DOUBLE) - (n_pairs - concordant))
       / n_pairs END AS kendall_tau
FROM counts CROSS JOIN folded
"""


QUERIES["rank_tau_eval"] = rank_tau_eval
ORACLES["rank_tau_eval"] = _rank_tau_sql()
