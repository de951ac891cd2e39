"""Physical-plan inspection helpers over ``df._jdf.queryExecution()``.

Pure string/plan introspection — no jobs run.  The helpers are the
vocabulary the plan-regression tests and SCALE.md audits share, so an
invariant is written once and asserted everywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The executed physical plan as text (AQE initial plan if not run)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` entry across the plan's scans,
    flattened — empty means nothing reached a scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        body = m.group(1).strip()
        if body:
            # split on predicate boundaries, not every comma — predicate
            # ARGUMENTS contain commas (EqualTo(label_name,up))
            out.extend(p.strip() for p in re.split(r",\s+(?=[A-Z])", body))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names the scans actually read (ReadSchema struct fields) —
    the column-pruning audit."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        for fld in m.group(1).split(","):
            name = fld.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def count_exchanges(df: DataFrame, before: str | None = None) -> int:
    """Number of Exchange (shuffle/broadcast) nodes; ``before`` cuts the
    plan at the first occurrence of that marker (e.g. ``"TakeOrdered"``)
    so presentation sorts don't count against an operator's budget."""
    plan = plan_string(df)
    if before and before in plan:
        plan = plan.split(before)[0]
    return plan.count("Exchange")


def count_nodes(df: DataFrame, node: str) -> int:
    return plan_string(df).count(node)


def has_cartesian(df: DataFrame) -> bool:
    plan = plan_string(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


@dataclass
class PlanSummary:
    exchanges: int
    joins: list[str] = field(default_factory=list)
    pushed: list[str] = field(default_factory=list)
    read_columns: list[str] = field(default_factory=list)
    cartesian: bool = False
    codegen_spans: int = 0


def summarize(df: DataFrame) -> PlanSummary:
    """One-call audit of the facts SCALE.md cares about."""
    plan = plan_string(df)
    joins = re.findall(
        r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    return PlanSummary(
        exchanges=plan.count("Exchange"),
        joins=joins,
        pushed=pushed_filters(df),
        read_columns=read_schema(df),
        cartesian=has_cartesian(df),
        # tree-format plans mark codegen stages as `*(N)` prefixes
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", plan))),
    )


def format_summary(s: PlanSummary) -> str:
    lines = [
        f"exchanges:      {s.exchanges}",
        f"joins:          {', '.join(s.joins) or '(none)'}",
        f"cartesian:      {s.cartesian}",
        f"codegen spans:  {s.codegen_spans}",
        f"pushed filters: {', '.join(s.pushed) or '(none)'}",
        f"read columns:   {', '.join(s.read_columns) or '(none)'}",
    ]
    return "\n".join(lines)
