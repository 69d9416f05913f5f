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

from distributed_system_mapreduce_spark.functions.text import TOKENS_EXPR
from distributed_system_mapreduce_spark.tables import load_table, spread

MG_K = 16      # counters per partition (kept < the synthetic vocab so
#                compression actually fires and tests see real error)
MG_TOPN = 20


def _mg_partials(batches: Iterator[pd.DataFrame]
                 ) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries: fold each Arrow batch's exact
    value_counts into the counter table (C-speed counting; the Python
    loop is over the <= vocab-sized count table, not rows), compress
    to MG_K counters on overflow. Emits the surviving counters plus
    one NULL-token row carrying the partition's decrement total."""
    counters: dict[str, int] = {}
    dec = 0
    for b in batches:
        for tok, c in b["tok"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > MG_K:
            vals = sorted(counters.values(), reverse=True)
            cut = vals[MG_K]  # (K+1)-th largest
            counters = {t: c - cut for t, c in counters.items()
                        if c - cut > 0}
            dec += cut
    yield pd.DataFrame({
        "tok": list(counters) + [None],
        "est": list(counters.values()) + [0],
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


QUERIES = {
    "freq_items_sketch": freq_items_sketch,
}

ORACLES: dict[str, str] = {}
