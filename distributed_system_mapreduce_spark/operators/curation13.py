"""Dedup tuning + boilerplate detection, wave 15:

- dedup_threshold_sweep: the MinHash-estimate threshold tuning table
                         — for each candidate Jaccard threshold tau,
                         how many LSH candidate pairs the estimator
                         keeps and what share of the candidate set
                         that is. THE table a production dedup run
                         reads to pick tau: sweep once on a sample,
                         not per-threshold corpus passes.
- doc_prefix_dup       : per-source census of duplicated document
                         PREFIXES (identical first-16-token
                         fingerprint) — the boilerplate-intro
                         detector that shingle-level near-dup
                         under-weights when only the head repeats
                         (licence headers, scraper banners, template
                         intros).

Exactness: signature agreement counts and prefix-group counts are
exact integers; shares/rates are single fixed-order double
expressions; the md5 prefix fingerprint is the same hex in both
engines. Both ops are oracle-checked hash-identical.

Scale shape (100 TB): the sweep reuses the banded-LSH candidate
generation (bucketed equi-join — never corpus x corpus) and folds
ALL thresholds in ONE conditional aggregation over the candidate
pairs (the ndcg_eval cutoff pattern); prefix dedup is one narrow
fingerprint projection, one partial-agg shuffle onto fingerprint
groups, one join back, one census agg. Driver state zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.operators.dedup import (
    DEDUP_MINHASH_SQL,
    N_HASHES,
    _bands_from,
    _candidates_from,
    _SIG_SQL,
    _signatures,
)
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

# ------------------------------------------------- dedup_threshold_sweep
SWEEP_TAUS = (2, 4, 6, 8, 10, 12)  # in SIXTEENTHS of N_HASHES: the
# estimator's resolution is 1/16, so thresholds are exact match
# counts — tau = k/16 keeps the comparison pure-integer in both
# engines (est >= k/16  <=>  n_matching >= k)


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each threshold k/N_HASHES: the number of LSH candidate
    pairs whose MinHash agreement reaches it, its share of the
    candidate set, and the mean estimate among the kept pairs (an
    exact integer ratio: sum of matching counts / (N_HASHES * kept)).
    One signature store (localCheckpoint), one banded candidate
    join, ONE conditional aggregation folding every threshold."""
    sig = _signatures(spark, sf_dir).transform(cut)
    cand = _candidates_from(_bands_from(sig)).select("doc_a", "doc_b")
    matches = None
    for i in range(N_HASHES):
        m = (F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}")).cast("long")
        matches = m if matches is None else matches + m
    est = (
        cand.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(matches.alias("nm"))
    )
    wide = est.groupBy().agg(
        F.count("*").cast("long").alias("n_cand"),
        *[F.sum(F.when(F.col("nm") >= k, 1).otherwise(0))
          .cast("long").alias(f"kept{k}") for k in SWEEP_TAUS],
        *[F.sum(F.when(F.col("nm") >= k, F.col("nm")).otherwise(0))
          .cast("long").alias(f"mass{k}") for k in SWEEP_TAUS],
    )
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), kept{k}, mass{k}" for k in SWEEP_TAUS)
    return (
        wide.select(
            "n_cand",
            F.expr(f"stack({len(SWEEP_TAUS)}, {stack_args})"
                   " AS (k, kept, mass)"))
        .selectExpr(
            f"CAST(k AS DOUBLE) / {N_HASHES} AS tau",
            "n_cand", "kept AS n_pairs_kept",
            # n_cand = 0 guard: Spark (ANSI off) would NULL, DuckDB
            # would inf/NaN — spell the NULL identically in both
            "CASE WHEN n_cand = 0 THEN CAST(NULL AS DOUBLE) "
            "ELSE CAST(kept AS DOUBLE) / n_cand END AS kept_share",
            "CASE WHEN kept = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            f"CAST(mass AS DOUBLE) / ({N_HASHES} * CAST(kept AS DOUBLE))"
            " END AS mean_est_kept",
        )
    )


_NM_SQL = " + ".join(
    f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
    for i in range(N_HASHES)
)
_SWEEP_KEPT = ",\n  ".join(
    f"SUM(CASE WHEN nm >= {k} THEN 1 ELSE 0 END) AS kept{k},\n"
    f"  SUM(CASE WHEN nm >= {k} THEN nm ELSE 0 END) AS mass{k}"
    for k in SWEEP_TAUS
)
_SWEEP_CUTS = " UNION ALL ".join(
    f"SELECT CAST({k} AS BIGINT) AS k, CAST(kept{k} AS BIGINT) AS kept,"
    f" CAST(mass{k} AS BIGINT) AS mass, n_cand FROM wide"
    for k in SWEEP_TAUS
)

DEDUP_THRESHOLD_SWEEP_SQL = f"""
WITH cand AS (SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_SQL})),
sig AS ({_SIG_SQL}),
est AS (
  SELECT ({_NM_SQL}) AS nm
  FROM cand c
  JOIN sig sa ON c.doc_a = sa.doc_id
  JOIN sig sb ON c.doc_b = sb.doc_id
),
wide AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
  {_SWEEP_KEPT}
  FROM est
)
SELECT CAST(k AS DOUBLE) / {N_HASHES} AS tau,
       n_cand, kept AS n_pairs_kept,
       CASE WHEN n_cand = 0 THEN CAST(NULL AS DOUBLE)
       ELSE CAST(kept AS DOUBLE) / n_cand END AS kept_share,
       CASE WHEN kept = 0 THEN CAST(NULL AS DOUBLE) ELSE
       CAST(mass AS DOUBLE) / ({N_HASHES} * CAST(kept AS DOUBLE))
       END AS mean_est_kept
FROM ({_SWEEP_CUTS})
"""


# ---------------------------------------------------------- doc_prefix_dup
PREFIX_TOKENS = 16
PREFIX_MIN_TOKENS = 4


def doc_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicated-prefix census: fingerprint = md5 of the
    first PREFIX_TOKENS whitespace tokens (docs under
    PREFIX_MIN_TOKENS tokens are skipped — short prefixes collide
    meaninglessly); a doc is boilerplate-headed if another doc shares
    its fingerprint. Output: docs measured, docs in duplicated-prefix
    groups, distinct duplicated prefixes, and the rate."""
    docs = spread(load_table(spark, "documents", sf_dir))
    fp = (
        docs.select("doc_id", "source",
                    F.expr(X.TOKENS_EXPR).alias("t"))
        .filter(F.expr(f"size(t) >= {PREFIX_MIN_TOKENS}"))
        .select(
            "doc_id", "source",
            F.expr(f"md5(concat_ws(' ', slice(t, 1, {PREFIX_TOKENS})))")
            .alias("fp"),
        )
    )
    groups = fp.groupBy("fp").agg(F.count("*").alias("c"))
    return (
        fp.join(groups, "fp")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast("long")
            .alias("n_dup_prefix_docs"),
            F.expr("COUNT(DISTINCT CASE WHEN c >= 2 THEN fp END)")
            .cast("long").alias("n_dup_prefixes"),
        )
        .selectExpr(
            "source", "n_docs", "n_dup_prefix_docs", "n_dup_prefixes",
            "CAST(n_dup_prefix_docs AS DOUBLE) / n_docs"
            " AS dup_prefix_rate",
        )
    )


DOC_PREFIX_DUP_SQL = f"""
WITH fp AS (
  SELECT doc_id, source,
         md5(array_to_string(t[1:{PREFIX_TOKENS}], ' ')) AS fp
  FROM (SELECT doc_id, source, {X.TOKENS_SQL} AS t FROM documents)
  WHERE len(t) >= {PREFIX_MIN_TOKENS}
),
groups AS (SELECT fp, COUNT(*) AS c FROM fp GROUP BY fp)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_prefix_docs,
       CAST(COUNT(DISTINCT CASE WHEN c >= 2 THEN fp.fp END) AS BIGINT)
         AS n_dup_prefixes,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_prefix_rate
FROM fp JOIN groups USING (fp)
GROUP BY source
"""


QUERIES = {
    "dedup_threshold_sweep": dedup_threshold_sweep,
    "doc_prefix_dup": doc_prefix_dup,
}

ORACLES = {
    "dedup_threshold_sweep": DEDUP_THRESHOLD_SWEEP_SQL,
    "doc_prefix_dup": DOC_PREFIX_DUP_SQL,
}


# --------------------------------------------------------- dedup_cross_lang
def dedup_cross_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of verified near-dup pairs whose documents carry
    DIFFERENT language labels — the machine-translation /
    language-mislabel detector (a high cross-lang dup rate means the
    lang-ID stage is wrong or the crawl holds templated translations;
    either way per-language mix statistics are lying). Pairs come
    from dedup_ngram_jaccard's verified output; the census keys on
    the (least, greatest) normalized language pair; jaccard extremes
    are order-independent min/max (never a float SUM across pairs)."""
    from distributed_system_mapreduce_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard")
    langs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang")
    x = (
        pairs.join(langs.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("lang", "lang_a"), "doc_a")
        .join(langs.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("lang", "lang_b"), "doc_b")
        .where(F.col("lang_a") != F.col("lang_b"))
    )
    return (
        x.groupBy(
            F.least("lang_a", "lang_b").alias("lang_lo"),
            F.greatest("lang_a", "lang_b").alias("lang_hi"),
        )
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def _cross_lang_sql() -> str:
    from distributed_system_mapreduce_spark.operators.dedup import (
        DEDUP_NGRAM_JACCARD_SQL,
    )

    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b, jaccard FROM ({DEDUP_NGRAM_JACCARD_SQL})
),
x AS (
  SELECT la.lang AS lang_a, lb.lang AS lang_b, jaccard
  FROM pairs
  JOIN documents la ON pairs.doc_a = la.doc_id
  JOIN documents lb ON pairs.doc_b = lb.doc_id
  WHERE la.lang <> lb.lang
)
SELECT least(lang_a, lang_b) AS lang_lo,
       greatest(lang_a, lang_b) AS lang_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(jaccard) AS min_jaccard,
       MAX(jaccard) AS max_jaccard
FROM x
GROUP BY 1, 2
"""


QUERIES["dedup_cross_lang"] = dedup_cross_lang
ORACLES["dedup_cross_lang"] = _cross_lang_sql()
