"""Training-batch export: packed shape invariants + FileStore
round-trip. The id/packing VALUES are oracle-checked via the
registered training_batches_digest query (test_queries_oracle)."""

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.operators.export import (
    PAD_ID,
    SEQ_LEN,
    training_batches,
    training_batches_digest,
)
from distributed_system_mapreduce_spark.sources.filestore import FileStore
from tests.conftest import SF_DIR


def test_batches_are_padded_to_seq_len(spark):
    tb = training_batches(spark, SF_DIR)
    bad = tb.where(F.size("input_ids") != SEQ_LEN).count()
    assert bad == 0
    # padding accounting: pads only ever appear at the tail, and only
    # on each stream's LAST sequence (packing is gap-free by
    # construction: every non-final sequence is exactly full)
    r = tb.select(
        F.max("n_real").alias("mx"),
        F.sum((F.col("n_real") < SEQ_LEN).cast("long")).alias("n_partial"),
        F.count("*").alias("n_seqs"),
        F.countDistinct("source", "shard").alias("n_streams"),
    ).collect()[0]
    assert r["mx"] <= SEQ_LEN
    assert r["n_partial"] <= r["n_streams"]
    assert r["n_seqs"] >= r["n_streams"]  # every stream packed
    # tail-padding: the padded suffix length equals SEQ_LEN - n_real
    mism = tb.where(
        F.size(F.filter("input_ids", lambda x: x == F.lit(PAD_ID)))
        # hash ids can collide with the pad sentinel among real ids,
        # so only require: trailing pads >= SEQ_LEN - n_real is exact
        # via slice comparison
        != F.lit(SEQ_LEN) - F.col("n_real")
    )
    # every id slot after n_real must be the pad sentinel
    tail_bad = tb.where(
        F.expr(f"exists(slice(input_ids, n_real + 1, {SEQ_LEN} - n_real), "
               f"x -> x <> '{PAD_ID}')")
    ).count()
    assert tail_bad == 0
    del mism


def test_digest_matches_batches(spark):
    """The digest view and the full export must describe the same
    packing (same grouping keys and lengths)."""
    tb = training_batches(spark, SF_DIR).select(
        "source", "shard", "seq_idx", "n_real")
    dg = training_batches_digest(spark, SF_DIR).select(
        "source", "shard", "seq_idx", "n_real")
    assert tb.exceptAll(dg).count() == 0
    assert dg.exceptAll(tb).count() == 0


def test_export_roundtrip_via_filestore(spark, tmp_path):
    fs = FileStore(spark, str(tmp_path / "store"))
    tb = training_batches(spark, SF_DIR)
    fs.write(tb, "batches", partition_by=["source"])
    back = fs.read("batches")
    assert back.count() == tb.count()
    assert back.where(F.size("input_ids") != SEQ_LEN).count() == 0
