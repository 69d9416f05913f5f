"""Curation wave 7: sketch-parameter engineering.

- lsh_param_sweep: candidate-volume census across MinHash-LSH
  banding configurations — the calibration table that picks
  (bands, rows/band) before a production dedup run: more bands =
  lower similarity threshold = more candidates to verify; the sweep
  quantifies that cost on the actual corpus instead of the s-curve
  formula alone.

Reference parity: SURVEY §2.D extension (a maple+juice pair in the
reference's model, /root/reference/maple_juice/maple_juice.go:376).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.operators.dedup import (
    _SIG_SQL,
    N_HASHES,
    _signatures,
)
from distributed_system_mapreduce_spark.lineage import cut

# (bands, rows_per_band) with bands * rows == N_HASHES
SWEEP_CONFIGS = ((2, 8), (4, 4), (8, 2))


def _sqrt_chain(nb: int, rpb: int) -> str:
    """(1/nb)^(1/rpb) as nested sqrt (rpb is a power of two): sqrt is
    IEEE correctly-rounded on both engines, libm pow() is not — a
    pow() here was a 1-ulp cross-engine hash risk."""
    e = f"(1.0 / {nb})"
    r = rpb
    while r > 1:
        e = f"sqrt({e})"
        r //= 2
    return e


def lsh_param_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each banding of the SAME 16 minhashes: how many distinct
    candidate pairs does the LSH stage emit, how many docs land in at
    least one collision, and what similarity threshold does the
    s-curve place there ((1/b)^(1/r))? The corpus-measured candidate
    budget each config implies.

    Shape: the signature table computes ONCE (localCheckpoint — the
    shared signature store) and every config derives its band table
    from those columns (md5 concat per band — a narrow projection);
    each config costs one (band, sig) equi-join self-join (the
    dedup_minhash bucket discipline — pairwise work only inside
    buckets) + a distinct-pair count. Threshold is a fixed pow()
    expression on exact integers, identical in both engines."""
    sig = _signatures(spark, sf_dir).transform(cut)
    outs = []
    for nb, rpb in SWEEP_CONFIGS:
        entries = []
        for b in range(nb):
            cols = [F.col(f"mh{b * rpb + r}") for r in range(rpb)]
            entries.append(F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(*cols)).alias("s")))
        bands = sig.select(
            "doc_id", F.explode(F.array(*entries)).alias("e")
        ).select("doc_id", "e.band", "e.s")
        a, c = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(c, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.s") == F.col("b.s"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct()
        )
        outs.append(cand.agg(
            F.lit(nb).cast("long").alias("bands"),
            F.lit(rpb).cast("long").alias("rows_per_band"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.countDistinct(F.col("da")).cast("long")
            .alias("n_left_docs"),
            F.expr(_sqrt_chain(nb, rpb)).alias("s_curve_threshold"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _sweep_block_sql(nb: int, rpb: int) -> str:
    bands = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS s FROM sig"
        .format(b=b, concat=" || ".join(
            f"mh{b * rpb + r}" for r in range(rpb)))
        for b in range(nb)
    )
    return f"""
  SELECT CAST({nb} AS BIGINT) AS bands,
         CAST({rpb} AS BIGINT) AS rows_per_band,
         CAST(COUNT(*) AS BIGINT) AS n_candidates,
         CAST(COUNT(DISTINCT da) AS BIGINT) AS n_left_docs,
         {_sqrt_chain(nb, rpb)} AS s_curve_threshold
  FROM (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM ({bands}) a
    JOIN ({bands}) b
      ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id
  )
"""


LSH_PARAM_SWEEP_SQL = "WITH sig AS ({sig}) {blocks}".format(
    sig=_SIG_SQL,
    blocks=" UNION ALL ".join(
        _sweep_block_sql(nb, rpb) for nb, rpb in SWEEP_CONFIGS),
)

assert all(nb * rpb == N_HASHES for nb, rpb in SWEEP_CONFIGS)




# ---------------------------------------------------- source_boilerplate
def source_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate census per source: explode each
    doc's DISTINCT word-bigram shingles (in-doc repetition is
    repetition_score's job), count how many docs carry each
    (source, shingle), and report the source's duplicate shingle
    mass 1 - distinct/total plus the single hottest shingle's share
    — the 'is this source one template stamped N times' signal that
    decides whether template-stripping must run before dedup (a
    boilerplate-heavy source floods MinHash-LSH with spurious
    candidates).

    Shape: Generate (inline shingle explode over materialized
    tokens, the shingles_from discipline) -> ONE partial-agg shuffle
    to (source, shingle) counts -> one to the source grid. All
    counts exact BIGINTs; the two shares are fixed-order double
    divisions."""
    from distributed_system_mapreduce_spark.functions import text as X
    from distributed_system_mapreduce_spark.tables import load_table, spread

    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select("source", X.tokens().alias("toks"))
    inc = (
        toks.select(
            "source",
            F.explode(F.array_distinct(F.expr(X.shingles_from("toks"))))
            .alias("s"))
        .groupBy("source", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        inc.groupBy("source")
        .agg(F.sum("c").cast("long").alias("n_incidences"),
             F.count(F.lit(1)).cast("long").alias("n_distinct"),
             F.max("c").cast("long").alias("top_docs"))
        .select(
            "source", "n_incidences", "n_distinct",
            (F.lit(1.0) - F.col("n_distinct").cast("double")
             / F.col("n_incidences").cast("double")).alias("dup_mass"),
            (F.col("top_docs").cast("double")
             / F.col("n_incidences").cast("double")).alias("top_share"),
        )
    )


from distributed_system_mapreduce_spark.functions import text as X  # noqa: E402

SOURCE_BOILERPLATE_SQL = f"""
WITH inc AS (
  SELECT source, s, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT DISTINCT doc_id, source, unnest({X.SHINGLES_SQL}) AS s
    FROM documents
  )
  GROUP BY source, s
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_incidences,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
         AS dup_mass,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share
FROM inc
GROUP BY source
"""


QUERIES = {
    "lsh_param_sweep": lsh_param_sweep,
    "source_boilerplate": source_boilerplate,
}

ORACLES = {
    "lsh_param_sweep": LSH_PARAM_SWEEP_SQL,
    "source_boilerplate": SOURCE_BOILERPLATE_SQL,
}
