"""Central registry: every implemented query + its DuckDB oracle.

Modules contribute (QUERIES, ORACLES) dicts; this module merges them
and asserts key discipline (an oracle without a query is a bug; a
query without an oracle is allowed only for non-SQL-expressible ops,
which the driver then checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_system_mapreduce_spark.operators import (
    asof,
    clustering,
    curation,
    curation2,
    dedup,
    engine_queries,
    mapreduce_queries,
    multimodal,
    relational,
    relational_ext,
    relational_ext2,
    similarity,
    text_analysis,
)

_MODULES = [mapreduce_queries, relational, relational_ext, relational_ext2,
            engine_queries, text_analysis, curation, curation2, dedup,
            similarity, clustering,
            multimodal, asof]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _k, _v in _m.QUERIES.items():
        if _k in QUERIES:
            raise ValueError(f"duplicate query key {_k!r}")
        QUERIES[_k] = _v
    ORACLES.update(getattr(_m, "ORACLES", {}))

_extra = set(ORACLES) - set(QUERIES)
if _extra:
    raise ValueError(f"oracles without queries: {_extra}")
