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
