"""Index-health + text-statistics operators, wave 14:

- lsh_bucket_balance : per-band bucket census of the MinHash-LSH
                       index — bucket counts, max bucket size, and
                       the exact collision-pair mass sum(c*(c-1)/2).
                       THE operational metric for LSH at 100 TB: the
                       candidate-join cost is exactly this pair mass,
                       and a hot bucket shows up here before it shows
                       up as a straggler task.
- charset_census     : per-language character-class composition
                       (alpha / digit / whitespace / other rates) —
                       the encoding/quality screen that catches
                       mojibake, digit soup, and wrong-language
                       routing at a glance.
- bigram_entropy_rate: per-source conditional token entropy
                       H(next | prev) over a B=64 hashed vocabulary —
                       the text-level twin of user_markov_entropy:
                       template/boilerplate sources sit near zero,
                       diverse prose near ln(B).

Exactness: counts are BIGINT aggregates; every logarithm is
functions/detmath.ln_det over exact integers; entropy terms fold over
a NUMERICALLY SORTED bounded list (<= B^2 cells per source); rates
are single fixed-order double expressions. All three are oracle-
checked hash-identical.

Scale shape (100 TB): lsh_bucket_balance is one partial agg over the
band table onto (band, sig) buckets then a <= N_BANDS-row rollup;
charset_census is a narrow regexp_count projection + one partial
agg; bigram_entropy_rate explodes adjacent pairs from the
materialized tokens column (the Generate-barrier idiom — never
re-running the tokenizer per element), partial-aggregates onto the
bounded (source, 64, 64) grid, and folds per source. No windows,
no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.functions.detmath import ln_det
from distributed_system_mapreduce_spark.operators.dedup import (
    _BANDS_SQL,
    _bands,
)
from distributed_system_mapreduce_spark.tables import load_table, spread

_FOLD = ("aggregate(sort_array(collect_list({t})), "
         "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
_FOLD_SQL = "list_reduce(list_sort(list({t})), (acc, t) -> acc + t)"


# ------------------------------------------------------ lsh_bucket_balance
def lsh_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band health census of the MinHash-LSH band table: bucket
    count, docs indexed, the largest bucket, and the exact collision
    pair mass sum over buckets of c*(c-1)/2 — the LSH candidate
    join's row count per band, i.e. the quantity the banding
    parameters exist to bound. mean_bucket is the load-balance
    indicator (max_bucket >> mean_bucket = a hot shingle pattern)."""
    bands = _bands(spark, sf_dir)
    buckets = bands.groupBy("band", "sig").agg(
        F.count("*").alias("c"))
    return (
        buckets.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("c").cast("long").alias("n_docs"),
            F.max("c").cast("long").alias("max_bucket"),
            F.sum(F.expr("c * (c - 1) DIV 2")).cast("long")
            .alias("collision_pairs"),
        )
        .selectExpr(
            "CAST(band AS BIGINT) AS band", "n_buckets", "n_docs",
            "max_bucket", "collision_pairs",
            "CAST(n_docs AS DOUBLE) / n_buckets AS mean_bucket",
        )
    )


LSH_BUCKET_BALANCE_SQL = f"""
WITH buckets AS (
  SELECT band, sig, COUNT(*) AS c
  FROM ({_BANDS_SQL})
  GROUP BY band, sig
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(MAX(c) AS BIGINT) AS max_bucket,
       CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS collision_pairs,
       CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean_bucket
FROM buckets
GROUP BY band
"""


# --------------------------------------------------------- charset_census
# Explicit ASCII classes on BOTH sides (the functions/text.py lesson:
# Java \s and RE2 \s disagree on vertical tab).
_ALPHA = "[A-Za-z]"
_DIGIT = "[0-9]"
_SPACE_EXPR = r"[ \\t\\n\\r\\f\\x0B]"
_SPACE_SQL = r"[ \t\n\r\f\v]"


def charset_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-class composition: exact BIGINT counts
    of alphabetic / digit / whitespace characters (other = the
    remainder) and their rates — the cheap full-corpus screen for
    encoding damage and content type drift. One narrow regexp_count
    projection + one partial-agg shuffle onto the language grid."""
    docs = spread(load_table(spark, "documents", sf_dir))
    per = docs.select(
        "lang",
        F.length("text").cast("long").alias("nc"),
        F.expr(f"regexp_count(text, '{_ALPHA}')").cast("long")
        .alias("na"),
        F.expr(f"regexp_count(text, '{_DIGIT}')").cast("long")
        .alias("nd"),
        F.expr(f"regexp_count(text, '{_SPACE_EXPR}')").cast("long")
        .alias("ns"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("n_chars"),
            F.sum("na").cast("long").alias("n_alpha"),
            F.sum("nd").cast("long").alias("n_digit"),
            F.sum("ns").cast("long").alias("n_space"),
        )
        .selectExpr(
            "lang", "n_docs", "n_chars", "n_alpha", "n_digit", "n_space",
            "n_chars - n_alpha - n_digit - n_space AS n_other",
            "CAST(n_alpha AS DOUBLE) / n_chars AS alpha_rate",
            "CAST(n_digit AS DOUBLE) / n_chars AS digit_rate",
            "CAST(n_space AS DOUBLE) / n_chars AS space_rate",
        )
    )


CHARSET_CENSUS_SQL = f"""
WITH per AS (
  SELECT lang,
         length(text) AS nc,
         len(regexp_extract_all(text, '{_ALPHA}')) AS na,
         len(regexp_extract_all(text, '{_DIGIT}')) AS nd,
         len(regexp_extract_all(text, '{_SPACE_SQL}')) AS ns
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nc) AS BIGINT) AS n_chars,
       CAST(SUM(na) AS BIGINT) AS n_alpha,
       CAST(SUM(nd) AS BIGINT) AS n_digit,
       CAST(SUM(ns) AS BIGINT) AS n_space,
       CAST(SUM(nc) - SUM(na) - SUM(nd) - SUM(ns) AS BIGINT) AS n_other,
       CAST(SUM(na) AS DOUBLE) / SUM(nc) AS alpha_rate,
       CAST(SUM(nd) AS DOUBLE) / SUM(nc) AS digit_rate,
       CAST(SUM(ns) AS DOUBLE) / SUM(nc) AS space_rate
FROM per
GROUP BY lang
"""


# ----------------------------------------------------- bigram_entropy_rate
B_ENT = 64  # hashed-vocab buckets: the (source, B, B) grid stays
# bounded at any corpus size; same md5-nibble construction as
# curation9's JS divergence so both engines agree bit-for-bit
_HEX = "'0123456789abcdef'"


def _bucket_expr(col: str) -> str:
    """Spark: first 2 md5 hex nibbles of `col` -> bucket in [0, B)."""
    return (f"CAST(conv(substring(md5({col}), 1, 2), 16, 10) AS BIGINT)"
            f" % {B_ENT}")


def _bucket_sql(col: str) -> str:
    return (f"((strpos({_HEX}, substr(md5({col}), 1, 1)) - 1) * 16 + "
            f"strpos({_HEX}, substr(md5({col}), 2, 1)) - 1) % {B_ENT}")


def bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source first-order token entropy rate H(next | prev) =
    sum_{a,b} (c_ab / N) ln(c_a / c_ab) over a B=64 hashed
    vocabulary: boilerplate/template sources replay the same token
    transitions (H ~ 0); diverse prose approaches ln(B). The
    text-level twin of user_markov_entropy, and the signal behind
    'this source is one page stamped a million times' that
    doc-level repetition scores miss when each doc is unique but the
    source grammar is degenerate.

    Adjacent pairs come from the materialized tokens column via an
    inline transform (the Generate-barrier idiom); ln is ln_det on
    exact integer counts; the per-source fold runs over the sorted
    <= B^2 cell list."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select("source", F.expr(X.TOKENS_EXPR).alias("t"))
    pair_expr = (
        "CASE WHEN size(t) < 2 THEN "
        "CAST(array() AS array<struct<a:string,b:string>>) ELSE "
        "transform(sequence(1, size(t) - 1), "
        "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"
        " END"
    )
    cells = (
        toks.select("source", F.explode(F.expr(pair_expr)).alias("p"))
        .select(
            "source",
            F.expr(_bucket_expr("p.a")).alias("ba"),
            F.expr(_bucket_expr("p.b")).alias("bb"),
        )
        .groupBy("source", "ba", "bb")
        .agg(F.count("*").alias("c_ab"))
    )
    marg = cells.groupBy("source", "ba").agg(
        F.sum("c_ab").alias("c_a"))
    term = (f"CAST(c_ab AS DOUBLE) * (({ln_det('c_a')})"
            f" - ({ln_det('c_ab')}))")
    return (
        cells.join(marg, ["source", "ba"])
        .withColumn("term", F.expr(term))
        .groupBy("source")
        .agg(
            F.sum("c_ab").cast("long").alias("n_bigrams"),
            F.count("*").cast("long").alias("n_cells"),
            F.expr(_FOLD.format(t="term")).alias("s"),
        )
        .selectExpr(
            "source", "n_bigrams", "n_cells",
            "s / CAST(n_bigrams AS DOUBLE) AS entropy_rate",
        )
    )


_ENT_TERM_SQL = (f"CAST(c_ab AS DOUBLE) * (({ln_det('c_a')})"
                 f" - ({ln_det('c_ab')}))")

BIGRAM_ENTROPY_RATE_SQL = f"""
WITH toks AS (SELECT source, {X.TOKENS_SQL} AS t FROM documents),
pairs AS (
  SELECT source, unnest(CASE WHEN len(t) < 2 THEN [] ELSE
    list_transform(range(1, len(t)),
      i -> {{'a': t[i], 'b': t[i + 1]}})
  END) AS p
  FROM toks
),
cells AS (
  SELECT source, {_bucket_sql("p.a")} AS ba, {_bucket_sql("p.b")} AS bb,
         COUNT(*) AS c_ab
  FROM pairs GROUP BY 1, 2, 3
),
marg AS (
  SELECT source, ba, SUM(c_ab) AS c_a FROM cells GROUP BY source, ba
)
SELECT source,
       CAST(SUM(c_ab) AS BIGINT) AS n_bigrams,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       {_FOLD_SQL.format(t=f"({_ENT_TERM_SQL})")}
         / CAST(SUM(c_ab) AS DOUBLE) AS entropy_rate
FROM cells JOIN marg USING (source, ba)
GROUP BY source
"""


QUERIES = {
    "lsh_bucket_balance": lsh_bucket_balance,
    "charset_census": charset_census,
    "bigram_entropy_rate": bigram_entropy_rate,
}

ORACLES = {
    "lsh_bucket_balance": LSH_BUCKET_BALANCE_SQL,
    "charset_census": CHARSET_CENSUS_SQL,
    "bigram_entropy_rate": BIGRAM_ENTROPY_RATE_SQL,
}
