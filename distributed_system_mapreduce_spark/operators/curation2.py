"""Second-wave curation queries: repetition signals, corpus n-gram
statistics, benchmark-contamination checking, domain-mixture
accounting and rebalance sampling, and sequence-packing stats.

These extend the LLM-training-data pipeline (text_analysis.py /
curation.py) with the remaining pre-training data-quality stages:
Gopher-style repetition filters, "is my eval set in my training
corpus" n-gram overlap checks (word-bigram scale here — the synthetic
docs are ~25 tokens; real corpora use 13-grams), DoReMi-style source-
mixture rebalancing, and the packing-efficiency accounting that sizes
a context-length budget.

Determinism discipline (repo-wide contract): counts are exact
integers; every double is a per-row fixed-order expression over
integers (+ - * / only); hash walls are md5 hex (bit-identical in
Spark and DuckDB).

Projection-collapse discipline: shingle transforms are ONLY ever
evaluated as the generator of an explode over a materialized tokens
column (the Generate keeps the tokens Project un-collapsed below it);
inlining them into a plain Project re-runs the tokenizer per element
(see functions/text.py).

Reference tie-in: the (term, count) family generalizes
mj_exe/wc_maple + juice_wordcount.go; deterministic hash sampling
generalizes the splitKey partition-by-key job
(/root/reference/mj_exe/splitKey.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut


# ----------------------------------------------------- repetition score
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText filter
    family): duplicate-token fraction, duplicate-bigram fraction, and
    top-bigram concentration.

    Scale shape: token/distinct counts are narrow per-row expressions;
    the bigram histogram is explode -> groupBy(doc_id, bigram) with
    map-side combine, re-aggregated by doc_id — both shuffles are
    keyed by doc_id (the table's natural key), so at 100 TB this is
    one pass over text with combine-sized exchanges."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select("doc_id", X.tokens().alias("toks"))
    stats = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_dtoks"),
    )
    big = (
        toks.select(
            "doc_id",
            F.explode(F.expr(X.shingles_from("toks"))).alias("s"))
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count("*").alias("n_dbigrams"),
            F.max("c").alias("top_bigram"),
        )
    )
    out = (
        stats.join(big, "doc_id", "left")
        .select(
            "doc_id", "n_toks", "n_dtoks",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_dbigrams", F.lit(0)).alias("n_dbigrams"),
            F.coalesce("top_bigram", F.lit(0)).alias("top_bigram"),
        )
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "doc_id", "n_toks", "n_dtoks", "n_bigrams", "top_bigram",
        F.when(F.col("n_toks") > 0,
               (dbl("n_toks") - dbl("n_dtoks")) / dbl("n_toks"))
        .otherwise(F.lit(0.0)).alias("dup_token_frac"),
        F.when(F.col("n_bigrams") > 0,
               (dbl("n_bigrams") - dbl("n_dbigrams")) / dbl("n_bigrams"))
        .otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        F.when(F.col("n_bigrams") > 0,
               dbl("top_bigram") / dbl("n_bigrams"))
        .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )


REPETITION_SCORE_SQL = f"""
WITH toks AS (SELECT doc_id, {X.TOKENS_SQL} AS toks FROM documents),
stats AS (
  SELECT doc_id, len(toks) AS n_toks,
         len(list_distinct(toks)) AS n_dtoks
  FROM toks
),
big AS (
  SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS n_dbigrams,
         MAX(c) AS top_bigram
  FROM (
    SELECT doc_id, s, COUNT(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS s
      FROM toks
    )
    GROUP BY doc_id, s
  )
  GROUP BY doc_id
)
SELECT doc_id, n_toks, n_dtoks, n_bigrams, top_bigram,
       CASE WHEN n_toks > 0 THEN
         (CAST(n_toks AS DOUBLE) - CAST(n_dtoks AS DOUBLE))
           / CAST(n_toks AS DOUBLE)
       ELSE 0.0 END AS dup_token_frac,
       CASE WHEN n_bigrams > 0 THEN
         (CAST(n_bigrams AS DOUBLE) - CAST(n_dbigrams AS DOUBLE))
           / CAST(n_bigrams AS DOUBLE)
       ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN n_bigrams > 0 THEN
         CAST(top_bigram AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
       ELSE 0.0 END AS top_bigram_frac
FROM (
  SELECT t.doc_id, t.n_toks, t.n_dtoks,
         CAST(COALESCE(g.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         COALESCE(g.n_dbigrams, 0) AS n_dbigrams,
         COALESCE(g.top_bigram, 0) AS top_bigram
  FROM stats t LEFT JOIN big g ON t.doc_id = g.doc_id
)
"""


# ------------------------------------------------------- corpus n-grams
TOP_NGRAMS = 50


def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 word bigrams: occurrence count + document
    frequency. One explode + one partial-aggregating shuffle on the
    bigram key (count-distinct over doc_id expands to a two-phase
    agg); global top-k is TakeOrderedAndProject, never a global
    window."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select("doc_id", X.tokens().alias("toks"))
    sh = toks.select(
        "doc_id",
        F.explode(F.expr(X.shingles_from("toks"))).alias("bigram"))
    return (
        sh.groupBy("bigram")
        .agg(F.count("*").alias("n_occ"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_occ"), F.asc("bigram"))
        .limit(TOP_NGRAMS)
    )


NGRAM_COUNTS_SQL = f"""
SELECT bigram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({X.SHINGLES_SQL}) AS bigram FROM documents)
GROUP BY bigram
ORDER BY n_occ DESC, bigram ASC
LIMIT {TOP_NGRAMS}
"""


# ------------------------------------------------- contamination check
# Held-out "benchmark" = every 97th doc (deterministic, ~1%). The
# product shape is the eval-set n-gram overlap scan.
CONTAM_MOD = 97
CONTAM_TAU = 0.5


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every non-benchmark document: how many of its distinct
    bigrams appear anywhere in the benchmark set, and the resulting
    contamination fraction / flag.

    Scale shape: the benchmark shingle vocabulary is tiny relative to
    the corpus (~1% of docs, distinct-ed) — broadcast it; the corpus
    side is one explode_outer (keeps shingle-less docs) -> broadcast
    left join -> one re-aggregation keyed by doc_id. No shuffle
    touches the full corpus's raw shingles."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % CONTAM_MOD == 0).alias("is_bench"),
        X.tokens().alias("toks"),
    )
    ex = toks.select(
        "doc_id", "is_bench",
        F.explode_outer(
            F.array_distinct(F.expr(X.shingles_from("toks")))).alias("s"),
    )
    bench_sh = (
        ex.filter("is_bench").filter(F.col("s").isNotNull())
        .select("s").distinct()
        .withColumn("hit", F.lit(1))
    )
    out = (
        ex.filter(~F.col("is_bench"))
        .join(F.broadcast(bench_sh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("s").alias("n_shingles"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_shared"),
        )
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.col("n_shared").cast("double")
        / F.col("n_shingles").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id", "n_shingles", "n_shared",
        frac.alias("contam_frac"),
        (frac >= CONTAM_TAU).cast("long").alias("contaminated"),
    )


CONTAMINATION_CHECK_SQL = f"""
WITH dsh AS (
  SELECT doc_id, doc_id % {CONTAM_MOD} = 0 AS is_bench,
         list_distinct({X.SHINGLES_SQL}) AS dsh
  FROM documents
),
bench_sh AS (
  SELECT DISTINCT unnest(dsh) AS s FROM dsh WHERE is_bench
),
shared AS (
  SELECT doc_id, COUNT(*) AS n_shared
  FROM (SELECT doc_id, unnest(dsh) AS s FROM dsh WHERE NOT is_bench)
  JOIN bench_sh USING (s)
  GROUP BY doc_id
),
base AS (
  SELECT d.doc_id, len(d.dsh) AS n_shingles,
         COALESCE(s.n_shared, 0) AS n_shared
  FROM dsh d LEFT JOIN shared s ON d.doc_id = s.doc_id
  WHERE NOT d.is_bench
)
SELECT doc_id, n_shingles, n_shared,
       CASE WHEN n_shingles > 0 THEN
         CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE)
       ELSE 0.0 END AS contam_frac,
       CAST(CASE WHEN n_shingles > 0 AND
         CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE)
           >= {CONTAM_TAU}
         THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM base
"""


# ----------------------------------------------------------- domain mix
def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture accounting: per-source doc/token totals, token
    share, and the resampling weight that would equalize token mass
    across sources (target = uniform 1/n_sources). weight > 1 means
    upsample, < 1 downsample — the DoReMi-style mixture input.

    Scale shape: one partial-agg shuffle on source; the grand-total /
    source-count row is a broadcast cross join. Shares and weights are
    fixed-order int->double divisions."""
    docs = load_table(spark, "documents", sf_dir)
    per_src = (
        docs.select("source", X.n_tokens().cast("long").alias("n_toks"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_toks").alias("total_tokens"))
    )
    grand = per_src.agg(
        F.count("*").alias("n_sources"),
        F.sum("total_tokens").alias("grand_tokens"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        per_src.crossJoin(F.broadcast(grand))
        .select(
            "source", "n_docs", "total_tokens",
            (dbl("total_tokens") / dbl("grand_tokens"))
            .alias("token_share"),
            (dbl("grand_tokens")
             / (F.col("n_sources") * F.col("total_tokens"))
             .cast("double")).alias("weight"),
        )
    )


DOMAIN_MIX_SQL = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS total_tokens
  FROM (SELECT source, {X.N_TOKENS_SQL} AS n_toks FROM documents)
  GROUP BY source
),
grand AS (
  SELECT COUNT(*) AS n_sources, SUM(total_tokens) AS grand_tokens
  FROM per_src
)
SELECT source, n_docs, total_tokens,
       CAST(total_tokens AS DOUBLE) / CAST(grand_tokens AS DOUBLE)
         AS token_share,
       CAST(grand_tokens AS DOUBLE)
         / CAST(n_sources * total_tokens AS DOUBLE) AS weight
FROM per_src CROSS JOIN grand
"""


# ------------------------------------------------- mix rebalance sample
# md5 first 4 hex chars -> 16-bit integer, identically in both engines
# (no conv() in DuckDB, so nibble-decode via instr over the hex
# alphabet — pure integer arithmetic). The md5 input is salted with
# 'mix:' so the keep decision is independent of the un-salted
# md5(doc_id) that drives train_val_split (curation.py) — otherwise a
# source downsampled below weight 0.5 would keep only docs whose hash
# falls entirely inside the 'train' bucket, emptying val/test for it.
def _hex16_expr(md5_input: str) -> str:
    h = f"md5({md5_input})"
    parts = [
        f"(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return " + ".join(parts)


def mix_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample over-represented sources to the uniform token mix:
    keep a document iff hash16(doc_id) < floor(min(1, weight) *
    65536), with weight from domain_mix. The keep decision is a pure
    function of (doc_id, per-source weight) — stable across runs,
    engines, and partitioning, so a 100 TB re-run never flips a
    document's fate. Per-source cutoffs ride in on a broadcast join;
    the filter itself is narrow."""
    docs = load_table(spark, "documents", sf_dir)
    # bounded per-source cutoffs; materialize once so the broadcast
    # below never replays domain_mix's corpus aggregates (r7 audit)
    cuts = domain_mix(spark, sf_dir).select(
        "source",
        F.floor(F.least(F.lit(1.0), F.col("weight")) * 65536)
        .cast("long").alias("cutoff"),
    ).transform(cut)
    h16 = F.expr(_hex16_expr("'mix:' || CAST(doc_id AS STRING)")).cast("long")
    return (
        docs.select("doc_id", "source", h16.alias("h16"))
        .join(F.broadcast(cuts), "source")
        .filter(F.col("h16") < F.col("cutoff"))
        .select("doc_id", "source", "h16", "cutoff")
    )


MIX_REBALANCE_SAMPLE_SQL = f"""
WITH mix AS ({DOMAIN_MIX_SQL}),
cuts AS (
  SELECT source,
         CAST(floor(least(1.0, weight) * 65536) AS BIGINT) AS cutoff
  FROM mix
)
SELECT doc_id, source, h16, cutoff
FROM (
  SELECT doc_id, source,
         CAST({_hex16_expr("'mix:' || CAST(doc_id AS VARCHAR)")} AS BIGINT) AS h16
  FROM documents
)
JOIN cuts USING (source)
WHERE h16 < cutoff
"""


# -------------------------------------------------------- packing stats
PACK_CTX = 64      # context length (tokens) for the packing ledger
PACK_BUCKET = 8    # histogram bucket width (tokens)
PACK_LAST = 15     # top bucket index (>= 120 tokens pools here)


def packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing ledger: doc-length histogram (8-token buckets,
    clamped) with, per bucket, the pad and truncation token mass if
    each doc occupied one PACK_CTX-token sequence. This is the
    accounting that sizes a context-length budget before tokenizing
    100 TB. Narrow per-row features + one partial-agg shuffle on the
    bucket key. Integer-only aggregates."""
    docs = load_table(spark, "documents", sf_dir)
    rows = docs.select(
        (F.least(F.expr(f"size({X.TOKENS_EXPR}) div {PACK_BUCKET}"),
                 F.lit(PACK_LAST)).cast("long") * PACK_BUCKET)
        .alias("bucket_lo"),
        X.n_tokens().cast("long").alias("n_toks"),
    )
    return (
        rows.groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("sum_tokens"),
            F.sum(F.lit(PACK_CTX) - F.least(F.col("n_toks"),
                                            F.lit(PACK_CTX)))
            .alias("pad_tokens"),
            F.sum(F.greatest(F.col("n_toks") - F.lit(PACK_CTX),
                             F.lit(0))).alias("truncated_tokens"),
        )
    )


PACKING_STATS_SQL = f"""
SELECT bucket_lo, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
       CAST(SUM({PACK_CTX} - least(n_toks, {PACK_CTX})) AS BIGINT)
         AS pad_tokens,
       CAST(SUM(greatest(n_toks - {PACK_CTX}, 0)) AS BIGINT)
         AS truncated_tokens
FROM (
  SELECT least(n_toks // {PACK_BUCKET}, {PACK_LAST}) * {PACK_BUCKET}
           AS bucket_lo,
         n_toks
  FROM (SELECT {X.N_TOKENS_SQL} AS n_toks FROM documents)
)
GROUP BY bucket_lo
"""


# ------------------------------------------- per-source adaptive gate
def quality_adaptive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE quality gate report: each source keeps its
    docs scoring at or above its OWN median quality — the per-domain
    threshold trick real curation uses instead of one global tau
    (a global cut empties clean-but-terse domains and keeps the best
    of a spammy one).

    Plan: per-row quality (narrow), joined to (doc_id, source) ONCE
    and localCheckpointed — the per-source median and the gating
    counts both reference the scored table, and each replayed the
    quality-feature regexes over the corpus otherwise (r7 scan
    audit: 4 scans, now 1); per-source exact percentile (one partial
    shuffle over bounded groups — switch to approx_percentile if
    sources are unbounded), thresholds broadcast back, conditional
    counts in one more partial agg. Median interpolation matches
    DuckDB quantile_cont bit-for-bit (same guarantee price_quantiles
    relies on)."""
    from distributed_system_mapreduce_spark.operators.text_analysis import (
        quality_score,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    scored = quality_score(spark, sf_dir).select("doc_id", "quality")
    sq = docs.join(scored, "doc_id").transform(cut)
    thr = sq.groupBy("source").agg(
        F.expr("percentile(quality, 0.5)").alias("thr"))
    return (
        sq.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("quality") >= F.col("thr"), 1)
                  .otherwise(0)).cast("long").alias("n_kept"),
            F.first("thr").alias("thr"),
        )
    )


def _quality_adaptive_sql() -> str:
    from distributed_system_mapreduce_spark.operators.text_analysis import (
        QUALITY_SCORE_SQL,
    )

    return f"""
WITH sq AS (
  SELECT d.source, q.quality
  FROM ({QUALITY_SCORE_SQL}) q JOIN documents d USING (doc_id)
),
thr AS (
  SELECT source, quantile_cont(quality, 0.5) AS thr
  FROM sq GROUP BY source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN quality >= thr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       ANY_VALUE(thr) AS thr
FROM sq JOIN thr USING (source)
GROUP BY source
"""


# ------------------------------------------------ token-budget sampling
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget downsample: each source keeps docs
    in md5-walk order until HALF its token mass is spent — the 'fit
    the mixture into a training budget' selection, reproducible across
    runs and engines (same salt-hash-order contract as
    train_val_split / mix_rebalance_sample).

    Plan: per-doc token counts (narrow), per-source budgets = one
    partial-agg shuffle broadcast back, running prefix sum via a
    window PARTITIONED BY source (never global). A pathologically hot
    source turns that window into a straggler at 100 TB — then shard
    it with the two-level prefix-sum pattern (per-shard cumsum +
    O(#shards) offsets, as range_partition_hist does globally)."""
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id", "source",
        X.n_tokens().cast("long").alias("n_toks"),
        F.md5(F.concat(F.lit("budget:"),
                       F.col("doc_id").cast("string"))).alias("h"),
    )
    budgets = base.groupBy("source").agg(
        F.expr("CAST(sum(n_toks) AS LONG) div 2").alias("budget"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum_toks", F.sum("n_toks").over(w))
    return (
        cum.join(F.broadcast(budgets), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("cum_toks") <= F.col("budget"), 1)
                  .otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("cum_toks") <= F.col("budget"),
                         F.col("n_toks")).otherwise(0))
            .cast("long").alias("tokens_kept"),
            F.first("budget").alias("budget"),
        )
    )


TOKEN_BUDGET_SQL = f"""
WITH base AS (
  SELECT doc_id, source, {X.N_TOKENS_SQL} AS n_toks,
         md5('budget:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
budgets AS (
  SELECT source, CAST(SUM(n_toks) AS BIGINT) // 2 AS budget
  FROM base GROUP BY source
),
cum AS (
  SELECT doc_id, source, n_toks,
         SUM(n_toks) OVER (PARTITION BY source ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_toks
  FROM base
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN cum_toks <= budget THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN cum_toks <= budget THEN n_toks ELSE 0 END)
            AS BIGINT) AS tokens_kept,
       ANY_VALUE(budget) AS budget
FROM cum JOIN budgets USING (source)
GROUP BY source
"""


QUERIES = {
    "repetition_score": repetition_score,
    "ngram_counts": ngram_counts,
    "contamination_check": contamination_check,
    "domain_mix": domain_mix,
    "mix_rebalance_sample": mix_rebalance_sample,
    "packing_stats": packing_stats,
    "quality_adaptive_filter": quality_adaptive_filter,
    "token_budget_sample": token_budget_sample,
}

ORACLES = {
    "repetition_score": REPETITION_SCORE_SQL,
    "ngram_counts": NGRAM_COUNTS_SQL,
    "contamination_check": CONTAMINATION_CHECK_SQL,
    "domain_mix": DOMAIN_MIX_SQL,
    "mix_rebalance_sample": MIX_REBALANCE_SAMPLE_SQL,
    "packing_stats": PACKING_STATS_SQL,
    "quality_adaptive_filter": _quality_adaptive_sql(),
    "token_budget_sample": TOKEN_BUDGET_SQL,
}
