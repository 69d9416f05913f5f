"""Estimator QA + compression-proxy quality, wave 16:

- dedup_estimator_pr : precision/recall of the MinHash Jaccard
                       ESTIMATOR against the exact bigram Jaccard at
                       each decision threshold — the table that says
                       whether 16 hashes are enough before a 100 TB
                       run trusts the sketch (the PR twin of
                       dedup_threshold_sweep's volume view and
                       dedup_minhash_estimate's per-pair view).
- compression_ratio  : per-document zlib compression ratio — the
                       classic low-quality-text signal (boilerplate
                       and template spam compress far below prose;
                       random noise doesn't compress at all), run as
                       a REAL Python kernel through the Arrow
                       mapInPandas stage. Rows-only by design (a
                       DEFLATE encoder is not SQL-expressible);
                       determinism + bound properties are pinned in
                       tests/test_wave16.py.

Scale shape (100 TB): the PR table folds every threshold in ONE
conditional aggregation over the (bounded) LSH candidate estimates;
compression_ratio is an embarrassingly parallel narrow Arrow map
(spread() for row-group-starved local scans). Driver state zero.

Thresholds are SIXTEENTHS >= 0.25: the exact-verify table is
thresholded at JACCARD_TAU = 0.2 (dedup.py:34), so 'exact side NULL'
means exact < 0.2 < tau — the NULL-as-negative treatment is sound
for every swept threshold, in both engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.operators.dedup import (
    DEDUP_MINHASH_ESTIMATE_SQL,
    N_HASHES,
    dedup_minhash_estimate,
)
from distributed_system_mapreduce_spark.tables import load_table, spread

PR_TAUS = (4, 6, 8, 10, 12)  # sixteenths: 0.25 .. 0.75


def dedup_estimator_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per threshold tau = k/N_HASHES over the LSH candidate pairs:
    how many pairs the estimator flags (est >= tau), how many the
    exact Jaccard flags, their overlap, and the resulting
    precision/recall (NULL when the denominator is empty — the same
    CASE in both engines). est >= k/16 is evaluated as the pure
    integer n_matching >= k."""
    est = dedup_minhash_estimate(spark, sf_dir).select(
        "n_matching", "jaccard")
    aggs = []
    for k in PR_TAUS:
        tau = k / N_HASHES
        e = F.col("n_matching") >= k
        x = F.col("jaccard").isNotNull() & (F.col("jaccard") >= tau)
        aggs += [
            F.sum(e.cast("long")).cast("long").alias(f"e{k}"),
            F.sum(x.cast("long")).cast("long").alias(f"x{k}"),
            F.sum((e & x).cast("long")).cast("long").alias(f"b{k}"),
        ]
    wide = est.groupBy().agg(*aggs)
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), e{k}, x{k}, b{k}" for k in PR_TAUS)
    return (
        wide.select(F.expr(
            f"stack({len(PR_TAUS)}, {stack_args})"
            " AS (k, n_est_pos, n_exact_pos, n_both)"))
        .selectExpr(
            f"CAST(k AS DOUBLE) / {N_HASHES} AS tau",
            "n_est_pos", "n_exact_pos", "n_both",
            "CASE WHEN n_est_pos = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            "CAST(n_both AS DOUBLE) / n_est_pos END AS est_precision",
            "CASE WHEN n_exact_pos = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            "CAST(n_both AS DOUBLE) / n_exact_pos END AS est_recall",
        )
    )


def _pr_cells_sql() -> str:
    cells = []
    for k in PR_TAUS:
        tau = f"{k} / CAST({N_HASHES} AS DOUBLE)"
        e = f"n_matching >= {k}"
        x = f"(jaccard IS NOT NULL AND jaccard >= {tau})"
        cells.append(
            f"SUM(CASE WHEN {e} THEN 1 ELSE 0 END) AS e{k},\n"
            f"  SUM(CASE WHEN {x} THEN 1 ELSE 0 END) AS x{k},\n"
            f"  SUM(CASE WHEN {e} AND {x} THEN 1 ELSE 0 END) AS b{k}")
    return ",\n  ".join(cells)


_PR_CUTS = " UNION ALL ".join(
    f"SELECT CAST({k} AS BIGINT) AS k, CAST(e{k} AS BIGINT) AS"
    f" n_est_pos, CAST(x{k} AS BIGINT) AS n_exact_pos,"
    f" CAST(b{k} AS BIGINT) AS n_both FROM wide"
    for k in PR_TAUS
)

DEDUP_ESTIMATOR_PR_SQL = f"""
WITH est AS (
  SELECT n_matching, jaccard FROM ({DEDUP_MINHASH_ESTIMATE_SQL})
),
wide AS (
  SELECT
  {_pr_cells_sql()}
  FROM est
)
SELECT CAST(k AS DOUBLE) / {N_HASHES} AS tau,
       n_est_pos, n_exact_pos, n_both,
       CASE WHEN n_est_pos = 0 THEN CAST(NULL AS DOUBLE) ELSE
       CAST(n_both AS DOUBLE) / n_est_pos END AS est_precision,
       CASE WHEN n_exact_pos = 0 THEN CAST(NULL AS DOUBLE) ELSE
       CAST(n_both AS DOUBLE) / n_exact_pos END AS est_recall
FROM ({_PR_CUTS})
"""


# --------------------------------------------------------- compression_ratio
ZLIB_LEVEL = 6  # fixed level: zlib output is deterministic for a
# given (input, level, strategy), which the determinism test pins


def compression_scores(docs: DataFrame) -> DataFrame:
    """df-level DEFLATE kernel over any (doc_id, source, text) frame
    — shared by the batch compression_ratio query and the streaming
    ingest gate (streaming/jobs.compression_gate_stream), so stream
    scores agree byte-for-byte with the batch twin."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            raw = [t.encode("utf-8") for t in b["text"]]
            z = [len(zlib.compress(r, ZLIB_LEVEL)) for r in raw]
            yield pd.DataFrame({
                "doc_id": b["doc_id"].values,
                "source": b["source"].values,
                "n_bytes": [len(r) for r in raw],
                "z_bytes": z,
                "ratio": [zb / max(len(r), 1)
                          for zb, r in zip(z, raw)],
            })

    return docs.select("doc_id", "source", "text").mapInPandas(
        run,
        schema=("doc_id long, source string, n_bytes long, "
                "z_bytes long, ratio double"),
    )


def compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DEFLATE compression ratio (zlib level 6):
    compressed bytes / raw utf-8 bytes. The classic cheap quality
    signal — template/boilerplate text compresses far below fluent
    prose, and near-random token soup doesn't compress — used as a
    Gopher-style filter input alongside repetition_score (which
    catches only EXACT n-gram repeats; DEFLATE catches fuzzy
    self-similarity inside its 32 KB window).

    Rows-only by design: a DEFLATE encoder is not SQL-expressible.
    The kernel is deterministic (fixed level/strategy), so two runs
    hash identically — pinned in tests. Arrow-batched narrow map;
    embarrassingly parallel at any scale."""
    return compression_scores(
        spread(load_table(spark, "documents", sf_dir)))


def compression_ratio_certify(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """The DEFLATE kernel promoted into the ORACLE GATE (the
    freq_items_certify pattern): zlib output bytes are not
    SQL-expressible (compression_ratio stays rows-only), but three
    facts hold for EVERY document by construction and are exactly
    recomputable — the raw utf-8 byte count (DuckDB recomputes it),
    zlib's worst-case expansion bound (compressBound: stored-block
    overhead ~n/1000 + constant; checked against a generous
    n/100 + 64), and losslessness (decompress(compress(x)) == x,
    verified inside the Arrow stage). Emits per-source exact counts
    plus violation tallies guaranteed 0 — a kernel bug that truncates,
    corrupts, or blows up a payload flips a tally and the gate goes
    red.

    Shape: one Arrow-batched narrow map (the certification adds a
    decompress per row — paid here because certification needs the
    roundtrip; production runs compression_scores alone), then one
    partial-agg shuffle on source (bounded group count)."""
    import zlib

    docs = spread(load_table(spark, "documents", sf_dir)).select(
        "source", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            raw = [t.encode("utf-8") for t in b["text"]]
            z = [zlib.compress(r, ZLIB_LEVEL) for r in raw]
            yield pd.DataFrame({
                "source": b["source"].values,
                "n_bytes": [len(r) for r in raw],
                "bound_viol": [
                    int(len(zz) > len(r) + len(r) // 100 + 64)
                    for zz, r in zip(z, raw)],
                "rt_fail": [
                    int(zlib.decompress(zz) != r)
                    for zz, r in zip(z, raw)],
            })

    scored = docs.mapInPandas(
        run, schema=("source string, n_bytes long, "
                     "bound_viol long, rt_fail long"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("raw_bytes"),
        F.sum("bound_viol").cast("long").alias("bound_violations"),
        F.sum("rt_fail").cast("long").alias("roundtrip_failures"),
    )


COMPRESSION_RATIO_CERTIFY_SQL = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS raw_bytes,
       CAST(0 AS BIGINT) AS bound_violations,
       CAST(0 AS BIGINT) AS roundtrip_failures
FROM documents
GROUP BY source
"""


QUERIES = {
    "dedup_estimator_pr": dedup_estimator_pr,
    "compression_ratio": compression_ratio,
    "compression_ratio_certify": compression_ratio_certify,
}

ORACLES = {
    "dedup_estimator_pr": DEDUP_ESTIMATOR_PR_SQL,
    "compression_ratio_certify": COMPRESSION_RATIO_CERTIFY_SQL,
}
