"""Importance weighting and LM-based quality scoring — the two
selection signals a pretraining-data pipeline runs after dedup:

- dsir_importance   : DSIR-style (Xie et al. 2023, "Data Selection
                      for Language Models via Importance Resampling")
                      hashed-ngram importance weights: log
                      p_target(x) - log p_raw(x) under bag-of-
                      hashed-unigram models, the score the paper
                      resamples raw data by to match a target
                      distribution.
- doc_lm_typicality : CCNet/KenLM-style LM quality proxy: per-doc
                      cross-entropy under the corpus's own char-
                      bigram model (low = typical fluent text, high =
                      gibberish/boilerplate outliers) — the standard
                      perplexity-bucket filter, with the corpus as
                      its own background model.

Both are oracle-checked EXACTLY despite needing logarithms: ln goes
through functions/detmath.ln_det (nested-sqrt construction, only
correctly-rounded IEEE ops, bit-identical cross-engine) and the
per-document sum of double terms folds over a NUMERICALLY SORTED term
list (IEEE + is commutative, so any deterministic multiset order
gives bit-identical sums; sorting the doubles themselves is the
simplest such order).

Scale shape (100 TB): tokenize/explode is narrow and linear; the
models are one partial-agg shuffle each, B=256 (DSIR) / |charset|^2
(bigram) rows, broadcast back; per-doc scores are one more partial
agg. No windows, no self-joins, driver state zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.functions.detmath import ln_det
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

# ------------------------------------------------------ dsir_importance
B_DSIR = 256  # hashed-feature buckets (the paper uses 10^4 for 8-grams;
# unigrams over this vocab need fewer; both engines hash identically)
DSIR_TARGET_LANG = "en"  # the target distribution: English documents

# 16 md5 bits -> bucket (Spark conv() / DuckDB strpos-parse, the same
# construction multimodal's phash uses)
_BUCKET_EXPR = (f"CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT) "
                f"% {B_DSIR}")
_HEX = "'0123456789abcdef'"
_BUCKET_SQL = (
    f"((strpos({_HEX}, substr(md5(tok), 1, 1)) - 1) * 4096 + "
    f"(strpos({_HEX}, substr(md5(tok), 2, 1)) - 1) * 256 + "
    f"(strpos({_HEX}, substr(md5(tok), 3, 1)) - 1) * 16 + "
    f"(strpos({_HEX}, substr(md5(tok), 4, 1)) - 1)) % {B_DSIR}"
)


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight: sum over hashed unigram
    buckets of c_x[b] * (ln p_target(b) - ln p_raw(b)), add-one
    smoothed. Resampling raw data with these weights shifts it toward
    the target distribution (here: the corpus's English slice) —
    the selection step between dedup and tokenization.

    ln is the deterministic nested-sqrt approximation (~5e-5 absolute
    — far below any meaningful weight difference) and the per-doc sum
    folds over numerically sorted terms, so the weights hash-match
    the DuckDB oracle bit-for-bit.

    Shape: ONE tokenize+explode pass to the per-(doc, lang, bucket)
    count table — the sufficient statistic every consumer needs; the
    background/target bucket margins and the 1-row totals are toy
    re-aggregates of it (the four-branch shape re-tokenized the
    corpus four times under genuinely different exchanges — r7 scan
    audit — so AQE reuse could never fire). localCheckpointed:
    doc x distinct-bucket rows of 4 ints, tiny next to the token
    stream it replaces."""
    docs = spread(load_table(spark, "documents", sf_dir))
    tok = docs.select(
        "doc_id", "lang", F.explode(X.tokens()).alias("tok")
    ).select("doc_id", "lang", F.expr(_BUCKET_EXPR).alias("b"))
    cxl = (
        tok.groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("c"))
        .transform(cut)
    )
    is_t = F.col("lang") == DSIR_TARGET_LANG
    n_r = cxl.groupBy("b").agg(F.sum("c").alias("nr"))
    n_t = (cxl.filter(is_t)
           .groupBy("b").agg(F.sum("c").alias("nt")))
    tot = cxl.groupBy().agg(
        F.sum("c").alias("tr"),
        F.sum(F.when(is_t, F.col("c")).otherwise(0)).alias("tt"))
    model = (
        n_r.join(n_t, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (F.expr(ln_det(f"(coalesce(nt, 0) + 1) / (tt + {B_DSIR})"))
             - F.expr(ln_det(f"(nr + 1) / (tr + {B_DSIR})")))
            .alias("delta"),
        )
    )
    cx = cxl.select("doc_id", "b", "c")
    return (
        cx.join(F.broadcast(model), "b")
        .withColumn("term", F.col("c").cast("double") * F.col("delta"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.expr("aggregate(sort_array(collect_list(term)), "
                   "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
            .alias("log_weight"),
        )
    )


_LN_PT = ln_det(f"(coalesce(nt, 0) + 1) / (tt + {B_DSIR})")
_LN_PR = ln_det(f"(nr + 1) / (tr + {B_DSIR})")

DSIR_IMPORTANCE_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, {_BUCKET_SQL} AS b
  FROM (SELECT doc_id, lang, unnest({X.TOKENS_SQL}) AS tok
        FROM documents)
),
n_r AS (SELECT b, COUNT(*) AS nr FROM tok GROUP BY b),
n_t AS (SELECT b, COUNT(*) AS nt FROM tok
        WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT COUNT(*) AS tr,
               SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1
                        ELSE 0 END) AS tt FROM tok),
model AS (
  SELECT b, ({_LN_PT}) - ({_LN_PR}) AS delta
  FROM n_r LEFT JOIN n_t USING (b) CROSS JOIN tot
),
cx AS (SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY doc_id, b)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       list_reduce(list_sort(list(CAST(c AS DOUBLE) * delta)),
                   (acc, t) -> acc + t) AS log_weight
FROM cx JOIN model USING (b)
GROUP BY doc_id
"""


# ---------------------------------------------------- doc_lm_typicality
def _char_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, bg) character-bigram stream; docs under 2 chars drop
    (no bigram), matching the oracle's range() producing no rows."""
    return docs.filter(F.length("text") >= 2).select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, length(text) - 1), "
            "i -> substring(text, i, 2))")).alias("bg"),
    )


def lm_model(docs: DataFrame) -> DataFrame:
    """The corpus char-bigram LM: (bg, nb, tot) — one bounded table
    (|charset|^2 rows), broadcastable; the static side a streaming
    ingest gate scores against."""
    bg = _char_bigrams(docs)
    model = bg.groupBy("bg").agg(F.count("*").alias("nb"))
    tot = bg.groupBy().agg(F.count("*").alias("tot"))
    return model.crossJoin(F.broadcast(tot))


def lm_score(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Per-document cross-entropy under `model` (from lm_model):
    H(x) = -(1/N_x) * sum_bg c_x[bg] * ln p_model(bg). Bigrams absent
    from the model drop (inner join) — the streaming caller scores new
    docs against a FROZEN corpus model, where unseen bigrams carry no
    in-model evidence."""
    cx = _char_bigrams(docs).groupBy("doc_id", "bg").agg(
        F.count("*").alias("c"))
    return (
        cx.join(F.broadcast(model), "bg")
        .withColumn(
            "term",
            F.col("c").cast("double") * F.expr(ln_det("nb / tot")))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            (-F.expr("aggregate(sort_array(collect_list(term)), "
                     "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
             / F.sum("c").cast("double")).alias("cross_entropy"),
        )
    )


def doc_lm_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own character-
    bigram LM. The perplexity-bucket quality signal (CCNet's KenLM
    filter with the corpus as its own LM): fluent in-distribution
    text scores low, character soup and foreign-script outliers
    score high. Streaming twin: streaming/jobs.lm_quality_stream
    scores an ingest feed against this same frozen model."""
    docs = spread(load_table(spark, "documents", sf_dir))
    return lm_score(docs, lm_model(docs))


DOC_LM_TYPICALITY_SQL = f"""
WITH bg AS (
  SELECT doc_id, unnest(list_transform(range(1, length(text)),
                        i -> substr(text, i, 2))) AS bg
  FROM documents WHERE length(text) >= 2
),
model AS (SELECT bg, COUNT(*) AS nb FROM bg GROUP BY bg),
tot AS (SELECT COUNT(*) AS tot FROM bg),
cx AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       -list_reduce(list_sort(list(CAST(c AS DOUBLE)
                                   * ({ln_det("nb / tot")}))),
                    (acc, t) -> acc + t)
         / CAST(SUM(c) AS DOUBLE) AS cross_entropy
FROM cx JOIN model USING (bg) CROSS JOIN tot
GROUP BY doc_id
"""


QUERIES = {
    "dsir_importance": dsir_importance,
    "doc_lm_typicality": doc_lm_typicality,
}

ORACLES = {
    "dsir_importance": DSIR_IMPORTANCE_SQL,
    "doc_lm_typicality": DOC_LM_TYPICALITY_SQL,
}


# ----------------------------------------------------- lang_source_pmi
def lang_source_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition bias detector: pointwise mutual information
    between language and source per (lang, source) cell —
    PMI = ln( p(l,s) / (p(l) p(s)) ). Cells with strongly positive
    PMI mean a source is a language silo (scraper bias / template
    farm); near-zero everywhere means language is independent of
    source and the mix is balanced. The summary statistic behind
    "is our crawl's language coverage coming from everywhere or from
    three domains?".

    Exact-oracle discipline: counts are integers; the PMI is ONE
    per-row deterministic-ln of an exact rational — no sums of
    doubles anywhere, so no fold is needed.

    Shape: ONE scan to the bounded (lang, source) cell table
    (localCheckpointed); the language/source margins and the 1-row
    total are toy re-aggregates of it — the four-branch shape
    scanned documents four times (r7 scan audit, the t_closeness
    margins pattern)."""
    docs = load_table(spark, "documents", sf_dir)
    cell = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n")).transform(cut)
    nl = cell.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    ns = cell.groupBy("source").agg(F.sum("n").alias("n_src"))
    tot = cell.groupBy().agg(F.sum("n").alias("n_tot"))
    return (
        cell.join(F.broadcast(nl), "lang")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang", "source",
            F.col("n").cast("long").alias("n"),
            # CAST n to DOUBLE *before* the multiply: at 100 TB
            # n * n_tot as BIGINT*BIGINT overflows int64, where Spark
            # (ANSI off) wraps silently and DuckDB errors — the double
            # product is exact for realistic counts (< 2^53 each side
            # of the ratio) and identical cross-engine.
            F.expr(ln_det(
                "(CAST(n AS DOUBLE) * n_tot) / "
                "(CAST(n_lang AS DOUBLE) * n_src)"))
            .alias("pmi"),
        )
    )


LANG_SOURCE_PMI_SQL = f"""
WITH cell AS (SELECT lang, source, COUNT(*) AS n
              FROM documents GROUP BY lang, source),
nl AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
ns AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
tot AS (SELECT COUNT(*) AS n_tot FROM documents)
SELECT lang, source, CAST(n AS BIGINT) AS n,
       {ln_det("(CAST(n AS DOUBLE) * n_tot) / "
               "(CAST(n_lang AS DOUBLE) * n_src)")} AS pmi
FROM cell JOIN nl USING (lang) JOIN ns USING (source) CROSS JOIN tot
"""

QUERIES["lang_source_pmi"] = lang_source_pmi
ORACLES["lang_source_pmi"] = LANG_SOURCE_PMI_SQL
