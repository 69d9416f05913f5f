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


def _balanced_calls(text: str, fname: str) -> list[str]:
    """Argument strings of every `fname(...)` call in `text`, with
    nested parentheses balanced (window specs embed
    specifiedwindowframe(...) calls)."""
    out = []
    i = 0
    marker = fname + "("
    while True:
        j = text.find(marker, i)
        if j < 0:
            return out
        k = j + len(marker) - 1  # at the opening paren
        depth = 0
        while k < len(text):
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        out.append(text[j + len(marker):k])
        i = k + 1


def _split_top_level(args: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def global_ordered_windows(plan: str) -> list[str]:
    """Every windowspecdefinition in `plan` with an EMPTY partition
    spec and a NON-EMPTY order spec — the all-rows-to-one-task shape.

    A spec's arguments are: partition columns, then order columns
    (carrying ASC/DESC), then the specifiedwindowframe(...) — so
    'no argument before the first ASC/DESC-or-frame entry' means the
    partition spec is empty. (A bare literal-grep for
    'windowspecdefinition()' never fires: an ORDERED global window
    prints its order spec inside the parens.)"""
    bad = []
    for args in _balanced_calls(plan, "windowspecdefinition"):
        partition, order = [], []
        for p in _split_top_level(args):
            if p.startswith("specifiedwindowframe"):
                continue
            if " ASC" in p or " DESC" in p:
                order.append(p)
            else:
                partition.append(p)
        if not partition and order:
            bad.append(args)
    return bad
