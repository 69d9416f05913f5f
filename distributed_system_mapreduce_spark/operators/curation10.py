"""Sampling and retrieval-evaluation primitives, wave 10:

- weighted_sample : Efraimidis–Spirakis weighted sampling WITHOUT
                    replacement as one distributed top-k pass —
                    key_i = ln(u_i) / w_i with u_i a deterministic
                    per-doc hash uniform; the k largest keys are an
                    exact weighted sample. THE one-pass distributed
                    algorithm for "sample 10M docs from 100 TB
                    proportionally to length/quality".
- ndcg_eval       : NDCG@k of the bm25_rank retrieval run against a
                    term-coverage gold label — the standard ranking
                    metric, computed at several cutoffs, so retrieval
                    changes (analyzer, k1/b, fusion) are regression-
                    testable as a single scalar per cutoff.

Exactness: u_i comes from the portable nibble-decoded md5 integer
(instr arithmetic, identical in Spark and DuckDB); ln goes through
functions/detmath.ln_det (correctly-rounded ops only — the
approximation is irrelevant for sampling correctness because BOTH
engines compute the bit-identical key, so they select the identical
sample); DCG discounts 1/log2(i+1) are ratios of two ln_det values;
all sums fold over sorted bounded lists (<= k terms).

Scale shape (100 TB): weighted_sample is a narrow per-row key
expression + ONE TakeOrderedAndProject (no shuffle beyond top-k
merge); ndcg_eval joins the bounded (<= BM25_TOPK rows) ranking
against per-doc labels computed in the same scan shape bm25 itself
uses, then folds constant-size lists. Driver state zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.functions.detmath import ln_det
from distributed_system_mapreduce_spark.operators.curation import (
    BM25_QUERY,
    bm25_rank,
    BM25_RANK_SQL,
)
from distributed_system_mapreduce_spark.tables import load_table, spread

_FOLD = ("aggregate(sort_array(collect_list({t})), "
         "CAST(0 AS DOUBLE), (acc, t) -> acc + t)")
_FOLD_SQL = "list_reduce(list_sort(list({t})), (acc, t) -> acc + t)"


# -------------------------------------------------------- weighted_sample
SAMPLE_K = 100


def _hex32(md5_input: str) -> str:
    """First 8 md5 nibbles -> 32-bit integer; instr arithmetic is
    portable across Spark and DuckDB (same idiom as curation2's
    _hex16_expr, widened for sampling-key resolution)."""
    h = f"md5({md5_input})"
    parts = [
        # BIGINT per nibble: the top nibble times 16^7 exceeds INT32
        # and Spark's ANSI mode faults on the overflow
        f"CAST(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(parts) + ")"


# u in (0, 1]: +1 lifts the (astronomically unlikely) all-zero hash
# off ln(0); the 'ws:' salt decorrelates from train_val_split's and
# mix_rebalance_sample's hash decisions.
_H32 = _hex32("'ws:' || CAST(doc_id AS STRING)")
_U01 = f"(CAST({_H32} + 1 AS DOUBLE) / 4294967296.0)"


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample without replacement,
    k=SAMPLE_K, weight = n_chars: every doc gets the deterministic
    key ln(u)/w (monotone in u^(1/w)); the SAMPLE_K largest keys ARE
    the weighted sample. One narrow map + one TakeOrderedAndProject —
    the same plan at 100 TB, no shuffle of the corpus, no rejection
    loop, reproducible across runs/engines/partitioning because u is
    a pure hash function of doc_id.

    Ref: Efraimidis & Spirakis 2006, "Weighted random sampling with
    a reservoir" (the A-ES one-pass scheme)."""
    docs = load_table(spark, "documents", sf_dir)
    key = F.expr(f"({ln_det(_U01)}) / CAST(n_chars AS DOUBLE)")
    return (
        docs.select(
            "doc_id", "source",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(SAMPLE_K)
    )


WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
       ({ln_det(_U01)}) / CAST(n_chars AS DOUBLE) AS es_key
FROM documents
ORDER BY es_key DESC, doc_id ASC
LIMIT {SAMPLE_K}
"""


# ------------------------------------------------------------- ndcg_eval
NDCG_CUTS = (5, 10, 20)
_LN2 = ln_det("2.0")


def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k (k in NDCG_CUTS) of bm25_rank's top-20 against the
    term-coverage gold label rel(doc) = |distinct query terms present|
    (0..3): DCG = sum_i (2^rel_i - 1) / log2(i + 1) over the BM25
    ordering, IDCG the same over the corpus-ideal ordering (rel desc,
    doc_id asc), NDCG = DCG / IDCG. One scalar per cutoff makes
    retrieval tuning (k1/b, analyzer, fusion weights) regression-
    testable.

    Shape: the ranking side is the bounded BM25_TOPK-row result; gold
    labels are a narrow per-row array_intersect on the same scan
    bm25 uses; the ideal head is one TakeOrderedAndProject; DCG/IDCG
    fold over <= k sorted terms. log2(i+1) = ln_det(i+1)/ln_det(2) —
    a ratio of two bit-identical doubles."""
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    docs = spread(load_table(spark, "documents", sf_dir))
    rel_expr = (f"size(array_intersect(array_distinct({X.TOKENS_EXPR}), "
                f"array({terms})))")
    rel = docs.select(
        "doc_id", F.expr(rel_expr).cast("long").alias("rel"))
    # the ranking and ideal sides are both BOUNDED (<= 20 rows), so
    # the un-partitioned rank windows run over constant-size inputs.
    # Join the 20-row ranking against RAW docs and tokenize AFTER the
    # broadcast join: the gold label is then computed for 20 documents
    # instead of re-tokenizing the whole corpus a second time (the
    # ideal side below pays the one full rel pass that is genuinely
    # needed for the corpus-wide ideal ordering).
    ranked = (
        F.broadcast(
            bm25_rank(spark, sf_dir)
            .select("doc_id", F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
                .alias("pos")))
        .join(docs, "doc_id")
        .select("doc_id", "pos",
                F.expr(rel_expr).cast("long").alias("rel"))
    )
    ideal = (
        rel.orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(max(NDCG_CUTS))
        .select("rel", F.row_number().over(
            Window.orderBy(F.desc("rel"), F.asc("doc_id"))).alias("pos"))
    )

    # ALL cutoffs in ONE conditional aggregation per side (collect_list
    # drops the NULLs the CASE emits past each cutoff), then stack()
    # unpivots the single joined row — the whole query is ONE plan with
    # ONE bm25 subtree and ONE ideal subtree. The previous per-cutoff
    # loop built 6 separate scalar aggregations over uncached
    # DataFrames, re-executing the bm25 corpus pass and the rel scan
    # per cutoff (6 corpus passes where 2 suffice — 5.5s at sf0.1, the
    # round-3 bench's slowest query).
    def dcgs(df: DataFrame, out: str) -> DataFrame:
        cond = ("CASE WHEN pos <= {k} THEN (" + _NDCG_TERM
                + ") END")
        return df.groupBy().agg(*[
            F.expr(_FOLD.format(t=cond.format(k=k)))
            .alias(f"{out}{k}")
            for k in NDCG_CUTS
        ])

    wide = dcgs(ranked, "dcg").crossJoin(dcgs(ideal, "idcg"))
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), dcg{k}, idcg{k}" for k in NDCG_CUTS)
    return (
        wide.select(F.expr(
            f"stack({len(NDCG_CUTS)}, {stack_args}) AS (k, dcg, idcg)"))
        .select("k", "dcg", "idcg",
                (F.col("dcg") / F.col("idcg")).alias("ndcg"))
    )


# exact (2^rel - 1) gains as literal doubles (rel in 0..3): pow() is
# a libm transcendental with no cross-engine guarantee
_GAIN = ("(CASE WHEN rel = 0 THEN CAST(0 AS DOUBLE) WHEN rel = 1 THEN CAST(1 AS DOUBLE) WHEN rel = 2 THEN CAST(3 AS DOUBLE) ELSE CAST(7 AS DOUBLE) END)")
_NDCG_TERM = (f"{_GAIN} / (({ln_det('pos + 1')}) / ({_LN2}))")


def _ndcg_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    cuts = []
    for k in NDCG_CUTS:
        cuts.append(f"""
SELECT CAST({k} AS BIGINT) AS k,
  (SELECT {_FOLD_SQL.format(t=_NDCG_TERM)} FROM ranked
    WHERE pos <= {k}) AS dcg,
  (SELECT {_FOLD_SQL.format(t=_NDCG_TERM)} FROM ideal
    WHERE pos <= {k}) AS idcg""")
    union = " UNION ALL ".join(cuts)
    return f"""
WITH rel AS (
  SELECT doc_id,
         CAST(len(list_intersect(list_distinct({X.TOKENS_SQL}),
                                 [{terms}])) AS BIGINT) AS rel
  FROM documents
),
bm AS ({BM25_RANK_SQL}),
ranked AS (
  SELECT bm.doc_id, rel,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, bm.doc_id ASC) AS pos
  FROM bm JOIN rel ON bm.doc_id = rel.doc_id
),
ideal AS (
  SELECT rel,
         ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id ASC) AS pos
  FROM rel
  QUALIFY pos <= {max(NDCG_CUTS)}
),
cuts AS ({union})
SELECT k, dcg, idcg, dcg / idcg AS ndcg FROM cuts
"""


QUERIES = {
    "weighted_sample": weighted_sample,
    "ndcg_eval": ndcg_eval,
}

ORACLES = {
    "weighted_sample": WEIGHTED_SAMPLE_SQL,
    "ndcg_eval": _ndcg_sql(),
}
