"""Queries routed through the generic MapleJuice engine API — proving
the legacy programmable path produces byte-identical results to the
declarative layer (same DuckDB oracle as the DataFrame twin).

mr_wordcount is the reference's flagship job pair
(mj_exe/wc_maple + mj_exe/juice_wordcount.go) written as two small
Python callables against engine/maple_juice.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from distributed_system_mapreduce_spark.engine.maple_juice import (
    MapleJuice,
    wrap_line_job,
)
from distributed_system_mapreduce_spark.operators.mapreduce_queries import (
    WORDCOUNT_SQL,
)
from distributed_system_mapreduce_spark.tables import load_table


def _wc_maple(line: str):
    # wc_maple: emit (word, "1") per whitespace token (bufio.ScanWords)
    for tok in line.split():
        yield tok, "1"


def _wc_juice(key: str, grp: pd.DataFrame) -> pd.DataFrame:
    # juice_wordcount.go:24 — wcmap[key] += count
    return pd.DataFrame({"word": [key], "cnt": [grp["value"].astype("int64").sum()]})


def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("text")
    mj = MapleJuice(spark)
    out = mj.run(
        docs,
        wrap_line_job(_wc_maple),
        _wc_juice,
        output_schema="word string, cnt long",
    )
    return out


def mr_wordcount_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same job through the range-partition shuffle path
    (Shuffle(partition="range"), maple_juice.go:688)."""
    docs = load_table(spark, "documents", sf_dir).select("text")
    mj = MapleJuice(spark)
    return mj.run(
        docs,
        wrap_line_job(_wc_maple),
        _wc_juice,
        partition="range",
        output_schema="word string, cnt long",
    )


QUERIES = {
    "mr_wordcount": mr_wordcount,
    "mr_wordcount_range": mr_wordcount_range,
}

ORACLES = {
    "mr_wordcount": WORDCOUNT_SQL,
    "mr_wordcount_range": WORDCOUNT_SQL,
}
