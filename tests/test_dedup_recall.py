"""Planted near-duplicate RECALL for the MinHash-LSH text pipeline.

The oracle gate proves Spark and DuckDB compute the same sketch — it
cannot catch a sketch that silently misses real duplicates (both
engines would agree on the miss). This harness plants documents with
known high Jaccard overlap in a scratch `documents` table and asserts
the banded candidate generator actually retrieves them. Deterministic:
the md5 hash family has no RNG.
"""

import os

from distributed_system_mapreduce_spark.registry import QUERIES

N_BASE = 40
TOKENS_PER_DOC = 40


def _scratch_corpus(spark, tmp_path):
    """N_BASE synthetic docs + a near-dup of each (one token of ~40
    changed => bigram Jaccard ~0.95) written as a sf-dir layout."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for i in range(N_BASE):
        toks = [vocab[(i * 7 + j * 3) % len(vocab)] + str((i + j) % 9)
                for j in range(TOKENS_PER_DOC)]
        rows.append((i, " ".join(toks), "en", "planted", len(toks)))
        near = list(toks)
        near[20] = "CHANGED"
        rows.append((i + 1000, " ".join(near), "en", "planted",
                     len(near)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    sf_dir = str(tmp_path / "planted")
    os.makedirs(sf_dir, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_minhash_lsh_recall_on_planted_neardups(spark, tmp_path):
    sf_dir = _scratch_corpus(spark, tmp_path)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
        .select("doc_a", "doc_b").collect()
    }
    planted = {(i, i + 1000) for i in range(N_BASE)}
    found = planted & pairs
    recall = len(found) / len(planted)
    # J ~ 0.95 pairs pass a 4x4 band with prob ~1-(1-J^4)^4 ~ 0.997;
    # the md5 family is fixed, so this is a deterministic floor.
    assert recall >= 0.9, (recall, sorted(planted - pairs)[:5])


def test_minhash_estimator_tracks_exact_on_planted(spark, tmp_path):
    """The signature-agreement Jaccard estimate must correlate with
    the exact Jaccard on the planted pairs (mean abs error bounded —
    16 hashes is a coarse sketch)."""
    sf_dir = _scratch_corpus(spark, tmp_path)
    rows = QUERIES["dedup_minhash_estimate"](spark, sf_dir).collect()
    planted_rows = [
        r for r in rows
        if (r["doc_a"], r["doc_b"]) in {(i, i + 1000)
                                        for i in range(N_BASE)}
    ]
    assert planted_rows, "no planted pair reached the estimator"
    err = sum(
        abs(float(r["jaccard_est"]) - float(r["jaccard"]))
        for r in planted_rows
    ) / len(planted_rows)
    assert err <= 0.25, err


def test_fuzzy_blocking_recall_vs_brute(spark):
    """q-gram blocking guarantees recall only for names longer than
    q*(d+1); the part catalog's names sit below that bound, so recall
    is an EMPIRICAL property here — measure it against the brute
    all-pairs levenshtein truth. On this catalog it is 1.0 (every
    true pair shares a gram); the assertion pins that, so a
    blocking-scheme change that silently loses pairs fails loudly."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.operators.fuzzy import (
        MAX_DIST,
        fuzzy_name_pairs,
    )
    from distributed_system_mapreduce_spark.tables import load_table
    from tests.conftest import SF_DIR

    got = {(r["name_a"], r["name_b"])
           for r in fuzzy_name_pairs(spark, SF_DIR).collect()}
    names = (load_table(spark, "part", SF_DIR)
             .select(F.col("p_name").alias("name")).distinct())
    a, b = names.alias("a"), names.alias("b")
    truth = {
        (r["na"], r["nb"])
        for r in a.join(b, F.col("a.name") < F.col("b.name"))
        .select(F.col("a.name").alias("na"), F.col("b.name").alias("nb"),
                F.levenshtein("a.name", "b.name").alias("d"))
        .filter(F.col("d") <= MAX_DIST).collect()
    }
    assert got == truth and truth
