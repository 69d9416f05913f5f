"""Lineage-cut posture switch (lineage.py).

The engine's materialization barriers all route through lineage.cut,
which picks localCheckpoint (test posture, lineage truncated) or
persist(MEMORY_AND_DISK)+count (cluster posture, lineage preserved so
executor loss degrades to recompute) from one session-level switch.
These tests prove (a) the switch actually flips the mechanism and
(b) results are bit-identical under both postures for the iterative
query families the barrier matters most for — pagerank, survival
analysis, and connected components.
"""

import pytest

from distributed_system_mapreduce_spark import lineage
from distributed_system_mapreduce_spark.operators.dedup import dedup_components
from distributed_system_mapreduce_spark.operators.relational_ext4 import (
    pagerank_parts,
)
from distributed_system_mapreduce_spark.operators.relational_ext10 import (
    user_survival_km,
)

from conftest import SF_DIR, normalize


@pytest.fixture
def persist_posture(spark):
    spark.conf.set(lineage.CONF_KEY, "persist")
    yield
    spark.conf.set(lineage.CONF_KEY, "local")
    spark.catalog.clearCache()


def _run(q, spark):
    df = q(spark, SF_DIR)
    return normalize(df.columns, df.collect())


def test_posture_default_is_local(spark):
    df = spark.range(4)
    assert lineage.posture(df) == "local"
    cut_df = lineage.cut(df)
    # localCheckpoint truncates lineage: the analyzed plan is a bare
    # LogicalRDD scan, no Range operator left.
    assert "Range" not in cut_df._jdf.queryExecution().analyzed().toString()
    assert cut_df.count() == 4


def test_posture_persist_keeps_lineage(spark, persist_posture):
    df = spark.range(4)
    assert lineage.posture(df) == "persist"
    cut_df = lineage.cut(df)
    assert cut_df.storageLevel.useDisk  # MEMORY_AND_DISK
    # lineage preserved: the original Range is still in the plan.
    assert "Range" in cut_df._jdf.queryExecution().analyzed().toString()
    assert cut_df.count() == 4
    cut_df.unpersist()


def test_posture_rejects_garbage(spark):
    spark.conf.set(lineage.CONF_KEY, "bogus")
    try:
        with pytest.raises(ValueError):
            lineage.posture(spark.range(1))
    finally:
        spark.conf.set(lineage.CONF_KEY, "local")


def test_explicit_mode_overrides_session(spark):
    # per-query persist=True knob must win even in local posture
    cut_df = lineage.cut(spark.range(3), mode="persist")
    assert cut_df.storageLevel.useDisk
    cut_df.unpersist()


@pytest.mark.parametrize("mode", ["persist", "reliable"])
@pytest.mark.parametrize("query", [pagerank_parts, user_survival_km,
                                   dedup_components])
def test_cluster_postures_match_local_mode(spark, query, mode):
    local = _run(query, spark)
    spark.conf.set(lineage.CONF_KEY, mode)
    try:
        got = _run(query, spark)
    finally:
        spark.conf.set(lineage.CONF_KEY, "local")
        spark.catalog.clearCache()
    assert got == local
    assert len(local) > 0


def test_reliable_mode_truncates_lineage_into_checkpoint(spark):
    """reliable = DataFrame.checkpoint(): lineage truncated (constant
    plan size for deep loops) AND blocks in the session checkpoint
    dir (survivable storage on a cluster)."""
    spark.conf.set(lineage.CONF_KEY, "reliable")
    try:
        cut_df = lineage.cut(spark.range(5).selectExpr("id", "id+1 AS y"))
        plan = cut_df._jdf.queryExecution().analyzed().toString()
        assert "Range" not in plan  # lineage gone
        assert cut_df.count() == 5
        ckpt = spark.sparkContext._jsc.sc().getCheckpointDir()
        assert not ckpt.isEmpty()
    finally:
        spark.conf.set(lineage.CONF_KEY, "local")


def test_cut_lazy_defers_materialization(spark):
    """cut_lazy (the eager=False chain form used by join_size_estimate)
    must not trigger a job at cut time in either posture, yet still
    act as a barrier once consumed."""
    df = spark.range(10).selectExpr("id", "id * id AS sq")
    lazy_local = lineage.cut_lazy(df)
    assert lazy_local.count() == 10
    spark.conf.set(lineage.CONF_KEY, "persist")
    try:
        lazy_persist = lineage.cut_lazy(df)
        assert lazy_persist.storageLevel.useDisk
        assert lazy_persist.count() == 10
        lazy_persist.unpersist()
    finally:
        spark.conf.set(lineage.CONF_KEY, "local")
