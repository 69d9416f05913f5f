"""Frequent-items sketching (Misra-Gries) — the third sketch family
next to HLL++ cardinality (approx_distinct_users_by_type) and
quantile sketches (approx_price_quantiles): bounded-memory heavy
hitters over an unbounded token stream, the sketch a 100 TB corpus
uses when even the exact top-k's first-stage vocabulary rollup is too
wide to shuffle.

Mergeable-summaries formulation (Misra-Gries 1982; merge rule from
Agarwal et al., "Mergeable Summaries", PODS 2012 — both public):
each partition keeps at most MG_K counters, compressing by
subtracting the (K+1)-th largest count whenever the table overflows;
partial summaries merge by plain summation, and the total subtracted
mass D bounds every token's undercount: est <= true <= est + D.

No oracle (rows-only by design, like the other sketches): the
estimate depends on partitioning. The error bound and containment
guarantees are enforced in tests/test_sketches.py against the exact
wordcount.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.text import (
    TOKENS_EXPR,
    TOKENS_SQL,
)
from distributed_system_mapreduce_spark.tables import load_table, spread
from distributed_system_mapreduce_spark.lineage import cut

MG_K = 16      # counters per partition (kept < the synthetic vocab so
#                compression actually fires and tests see real error)
MG_TOPN = 20


def _mg_partials(batches: Iterator[pd.DataFrame]
                 ) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries: fold each Arrow batch's exact
    value_counts into the counter table, compress to MG_K counters on
    overflow. Emits the surviving counters plus one NULL-token row
    carrying the partition's decrement total.

    r11 (guide §4.2 vectorize inside the Arrow batch): the merge is a
    single index-aligned Series.add per batch and the compression one
    np.partition + vectorized subtract/filter — no Python loop over
    the counter table. Alignment upcasts to float64; counts are exact
    small ints, so the int64 round-trip is lossless, and the kept/
    dropped sets and estimates are identical to the r10 dict fold."""
    import numpy as np

    counters = pd.Series(dtype="int64")
    dec = 0
    for b in batches:
        counters = counters.add(
            b["tok"].value_counts(), fill_value=0).astype("int64")
        if len(counters) > MG_K:
            vals = counters.to_numpy()
            cutv = int(-np.partition(-vals, MG_K)[MG_K])  # (K+1)-th
            counters = counters[counters > cutv] - cutv
            dec += cutv
    yield pd.DataFrame({
        "tok": list(counters.index) + [None],
        "est": list(counters.to_numpy()) + [0],
        "dec": [0] * len(counters) + [dec],
    })


def freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the documents token stream with MG_K
    counters per partition: top-20 tokens by merged lower-bound
    estimate, each row carrying the global undercount bound
    (est <= true <= est + max_undercount).

    Shape: JVM-side tokenize + explode, Arrow-batched per-partition
    summaries (state <= MG_K counters regardless of stream length —
    the whole point), one summary-sized shuffle (#partitions x MG_K
    rows, NOT the vocabulary), TakeOrdered final. The exact twin
    (wordcount / term_doc_freq) shuffles the full vocabulary; this
    trades bounded error for a constant-width shuffle."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select(
        F.explode(F.expr(TOKENS_EXPR)).alias("tok"))
    parts = toks.mapInPandas(
        _mg_partials, schema="tok string, est long, dec long")
    bound = parts.agg(
        F.sum("dec").cast("long").alias("max_undercount"))
    merged = (
        parts.where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("est").cast("long").alias("est_count"))
    )
    return (
        merged.crossJoin(F.broadcast(bound))
        .orderBy(F.desc("est_count"), F.asc("tok"))
        .limit(MG_TOPN)
    )


def freq_items_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Misra-Gries sketch's THEOREM GUARANTEES promoted into the
    ORACLE GATE (the ann_recall_eval pattern): the merged estimates
    depend on partitioning (freq_items_sketch stays rows-only), but
    two properties hold for EVERY partitioning by construction —
    est <= true <= est + D for every surviving counter (Agarwal et
    al., Mergeable Summaries, PODS 2012), and every token with
    true > D survives. This entry joins the sketch against the exact
    wordcount and emits the violation counts (guaranteed 0) next to
    exact corpus totals the oracle recomputes; ANY implementation
    bug that breaks the sandwich or drops a heavy hitter flips a
    count and the gate goes red.

    Shape: the sketch side is the constant-width summary shuffle;
    the exact side is one vocabulary rollup (the certification cost —
    paid here because certification needs truth; production runs the
    sketch alone)."""
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("tok"))
    parts = toks.mapInPandas(
        _mg_partials, schema="tok string, est long, dec long")
    # materialize the summaries once: the bound, the counter table,
    # and the miss check below would otherwise re-run the Arrow stage
    parts = parts.transform(cut)
    bound = parts.agg(F.sum("dec").cast("long").alias("d"))
    merged = (
        parts.where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("est").cast("long").alias("est"))
    )
    exact = toks.groupBy("tok").agg(
        F.count("*").cast("long").alias("true_c"))
    joined = (
        exact.join(F.broadcast(merged), "tok", "left")
        .crossJoin(F.broadcast(bound))
    )
    return joined.agg(
        F.sum("true_c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct_tokens"),
        F.sum(
            F.when(
                F.col("est").isNotNull()
                & (~((F.col("est") <= F.col("true_c"))
                     & (F.col("true_c") <= F.col("est") + F.col("d")))),
                1).otherwise(0)
        ).cast("long").alias("sandwich_violations"),
        F.sum(
            F.when(
                (F.col("true_c") > F.col("d")) & F.col("est").isNull(),
                1).otherwise(0)
        ).cast("long").alias("heavy_hitters_missed"),
    )


FREQ_ITEMS_CERTIFY_SQL = f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL}) AS tok FROM documents
),
exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_c
  FROM toks GROUP BY tok
)
SELECT CAST(SUM(true_c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
       CAST(0 AS BIGINT) AS sandwich_violations,
       CAST(0 AS BIGINT) AS heavy_hitters_missed
FROM exact
"""


QUERIES = {
    "freq_items_sketch": freq_items_sketch,
    "freq_items_certify": freq_items_certify,
}

ORACLES: dict[str, str] = {
    "freq_items_certify": FREQ_ITEMS_CERTIFY_SQL,
}
