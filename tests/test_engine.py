"""MapleJuice engine invariants: parity with the declarative layer,
hash vs range shuffle equivalence, legacy line-job adapter."""

import pandas as pd
import pytest

from distributed_system_mapreduce_spark.engine.maple_juice import (
    MapleJuice,
    wrap_line_job,
)
from distributed_system_mapreduce_spark.operators.engine_queries import (
    mr_wordcount,
    mr_wordcount_range,
)
from distributed_system_mapreduce_spark.operators.mapreduce_queries import wordcount
from tests.conftest import SF_DIR


def _as_dict(df):
    return {r[0]: r[1] for r in df.collect()}


def test_engine_matches_dataframe_wordcount(spark):
    assert _as_dict(mr_wordcount(spark, SF_DIR)) == _as_dict(
        wordcount(spark, SF_DIR))


def test_range_shuffle_matches_hash(spark):
    assert _as_dict(mr_wordcount_range(spark, SF_DIR)) == _as_dict(
        mr_wordcount(spark, SF_DIR))


def test_wrap_line_job_adapter():
    fn = wrap_line_job(lambda line: [(t, "1") for t in line.split()])
    out = fn(pd.Series(["a b", "b c", None]))
    assert list(out["key"]) == ["a", "b", "b", "c"]
    assert set(out["value"]) == {"1"}


def test_juice_rejects_bad_partition(spark):
    mj = MapleJuice(spark)
    kv = spark.createDataFrame([("a", "1")], "key string, value string")
    with pytest.raises(ValueError):
        mj.juice(kv, lambda k, g: g, partition="random")


def test_maple_custom_column_and_tasks(spark):
    mj = MapleJuice(spark)
    df = spark.createDataFrame(
        [(1, "x y"), (2, "y z")], "id long, body string")
    kv = mj.maple(df, wrap_line_job(
        lambda line: [(t, "1") for t in line.split()]),
        num_tasks=2, input_col="body")
    counts = kv.groupBy("key").count().collect()
    assert {r["key"]: r["count"] for r in counts} == {
        "x": 1, "y": 2, "z": 1}


# ------------------------------------------------------ external exes
def test_exe_wordcount_matches_dataframe(spark):
    """Both phases as external processes (executeMapleExe parity,
    maple_juice.go:241) == the declarative wordcount."""
    from distributed_system_mapreduce_spark.operators.engine_queries import (
        mr_wordcount_exe,
    )

    assert _as_dict(mr_wordcount_exe(spark, SF_DIR)) == _as_dict(
        wordcount(spark, SF_DIR))


def test_exe_awk_maple_range_juice(spark):
    """A genuinely non-Python binary (awk) as the maple exe, plus the
    range-shuffle juice path, against the same truth."""
    from pyspark.sql import functions as F

    from distributed_system_mapreduce_spark.tables import load_table

    mj = MapleJuice(spark)
    docs = load_table(spark, "documents", SF_DIR).select("text")
    kv = mj.maple_exe(
        docs, "awk '{for (i = 1; i <= NF; i++) print $i, 1}'")
    out = mj.juice_exe(
        kv,
        "awk '{s += $2} END {print $1, s}'",
        partition="range", num_tasks=4,
    )
    got = {r["key"]: int(r["value"]) for r in out.collect()}
    assert got == _as_dict(wordcount(spark, SF_DIR))


def test_exe_failure_surfaces(spark):
    mj = MapleJuice(spark)
    df = spark.createDataFrame([("x",)], "line string")
    kv = mj.maple_exe(df, "false")
    with pytest.raises(Exception, match="exited with status"):
        kv.collect()
