"""Physical-plan audit helpers.

The scale posture of every operator is enforced in tests/test_plans.py
with these predicates over .explain("formatted") output: filters must
reach the parquet scan (PushedFilters), dimension joins must broadcast,
aggregates must have a map-side partial step, and hot paths must stay
out of Python (no BatchEvalPython / no CartesianProduct surprises).
A query that silently regresses to a bad plan fails CI, not the
1000-executor run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def plan_has(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n in plan for n in needles)


def plan_lacks(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n not in plan for n in needles)
