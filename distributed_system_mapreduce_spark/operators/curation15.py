"""Curation budgeting, wave 18:

- quality_pareto_frontier : the quality-threshold tradeoff table —
                            for each cutoff tau, the documents and
                            TOKENS that survive quality_filter at
                            that bar, as counts and shares. The
                            curve a data lead reads before choosing
                            QUALITY_TAU: "how much data does each
                            notch of quality cost?".
- source_sampling_weights : temperature-scaled source mixing weights
                            w_s ∝ (tokens_s)^0.5 (T=0.5 — the
                            standard multilingual/source rebalance
                            rule; the exponent is a sqrt so every
                            operation stays correctly rounded, no
                            transcendentals), with the boost factor
                            vs natural sampling each source gets.

Exactness: token/doc counts are BIGINT; the quality score is the
same bit-identical fixed-order composite quality_score publishes, so
`quality >= tau` decides identically in both engines; the weight
normalizer is a sorted fold over the bounded per-source sqrt list;
every output double is one fixed-order expression.

Scale shape (100 TB): the frontier folds ALL cutoffs in ONE
conditional aggregation over the scored corpus (a single narrow
scan + 1-row agg); the weights are one partial agg onto the bounded
source grid + a broadcast 1-row total. No windows, driver state zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.operators.text_analysis import (
    QUALITY_SCORE_SQL,
    quality_score,
)
from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.tables import load_table, spread

_FOLD = ("aggregate(sort_array(collect_list({t})), "
         "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
_FOLD_SQL = "list_reduce(list_sort(list({t})), (acc, t) -> acc + t)"

# ------------------------------------------------- quality_pareto_frontier
PARETO_TAUS = (30, 40, 50, 60, 70, 80, 90)  # percent, exact literals


def quality_pareto_frontier(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """For each quality cutoff tau: surviving documents and tokens
    with their corpus shares. quality is the bit-identical composite
    from quality_score, so the >= decisions match the oracle
    row-for-row; all cutoffs fold in one conditional aggregation."""
    scored = quality_score(spark, sf_dir).select("n_toks", "quality")
    aggs = [
        F.count("*").cast("long").alias("nd"),
        F.sum("n_toks").cast("long").alias("nt"),
    ]
    for k in PARETO_TAUS:
        tau = k / 100.0
        keep = F.col("quality") >= tau
        aggs += [
            F.sum(keep.cast("long")).cast("long").alias(f"d{k}"),
            F.sum(F.when(keep, F.col("n_toks")).otherwise(0))
            .cast("long").alias(f"t{k}"),
        ]
    wide = scored.groupBy().agg(*aggs)
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), d{k}, t{k}" for k in PARETO_TAUS)
    return (
        wide.select(
            "nd", "nt",
            F.expr(f"stack({len(PARETO_TAUS)}, {stack_args})"
                   " AS (k, n_docs_kept, n_tokens_kept)"))
        .selectExpr(
            "CAST(k AS DOUBLE) / 100.0 AS tau",
            "n_docs_kept", "n_tokens_kept",
            "CAST(n_docs_kept AS DOUBLE) / nd AS doc_share",
            "CAST(n_tokens_kept AS DOUBLE) / nt AS token_share",
        )
    )


def _pareto_sql() -> str:
    cells = []
    for k in PARETO_TAUS:
        tau = f"{k} / 100.0"
        cells.append(
            f"SUM(CASE WHEN quality >= {tau} THEN 1 ELSE 0 END)"
            f" AS d{k},\n"
            f"  SUM(CASE WHEN quality >= {tau} THEN n_toks ELSE 0 END)"
            f" AS t{k}")
    wide_cols = ",\n  ".join(cells)
    cuts = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS k, CAST(d{k} AS BIGINT) AS"
        f" n_docs_kept, CAST(t{k} AS BIGINT) AS n_tokens_kept,"
        f" nd, nt FROM wide"
        for k in PARETO_TAUS)
    return f"""
WITH scored AS (SELECT n_toks, quality FROM ({QUALITY_SCORE_SQL})),
wide AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(n_toks) AS BIGINT) AS nt,
  {wide_cols}
  FROM scored
)
SELECT CAST(k AS DOUBLE) / 100.0 AS tau,
       n_docs_kept, n_tokens_kept,
       CAST(n_docs_kept AS DOUBLE) / nd AS doc_share,
       CAST(n_tokens_kept AS DOUBLE) / nt AS token_share
FROM ({cuts})
"""


# ------------------------------------------------- source_sampling_weights
def source_sampling_weights(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """Temperature-0.5 source mixing weights: w_s = sqrt(tokens_s) /
    Σ sqrt(tokens), with each source's natural token share and the
    boost factor the rebalance gives it (boost > 1 = the temperature
    up-samples this minority source). sqrt keeps every op correctly
    rounded; the normalizer folds the bounded per-source sqrt list
    in sorted order, identically in both engines."""
    docs = spread(load_table(spark, "documents", sf_dir))
    per = docs.groupBy("source").agg(
        F.sum(X.n_tokens().cast("long")).cast("long").alias("tok"))
    tot = per.groupBy().agg(
        F.sum("tok").cast("long").alias("tok_total"),
        F.expr(_FOLD.format(t="sqrt(CAST(tok AS DOUBLE))"))
        .alias("norm"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "source", "tok AS n_tokens",
            "CAST(tok AS DOUBLE) / tok_total AS natural_share",
            "sqrt(CAST(tok AS DOUBLE)) / norm AS weight",
            "(sqrt(CAST(tok AS DOUBLE)) / norm)"
            " / (CAST(tok AS DOUBLE) / tok_total) AS boost",
        )
    )


SOURCE_SAMPLING_WEIGHTS_SQL = f"""
WITH per AS (
  SELECT source, CAST(SUM({X.N_TOKENS_SQL}) AS BIGINT) AS tok
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(tok) AS BIGINT) AS tok_total,
         {_FOLD_SQL.format(t="sqrt(CAST(tok AS DOUBLE))")} AS norm
  FROM per
)
SELECT source, tok AS n_tokens,
       CAST(tok AS DOUBLE) / tok_total AS natural_share,
       sqrt(CAST(tok AS DOUBLE)) / norm AS weight,
       (sqrt(CAST(tok AS DOUBLE)) / norm)
         / (CAST(tok AS DOUBLE) / tok_total) AS boost
FROM per CROSS JOIN tot
"""


QUERIES = {
    "quality_pareto_frontier": quality_pareto_frontier,
    "source_sampling_weights": source_sampling_weights,
}

ORACLES = {
    "quality_pareto_frontier": _pareto_sql(),
    "source_sampling_weights": SOURCE_SAMPLING_WEIGHTS_SQL,
}
