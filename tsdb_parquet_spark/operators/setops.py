"""Set operations — INTERSECT / EXCEPT / UNION (distinct) / UNION ALL.

Not in the reference (SURVEY.md §2.2 "Set operations").  Spark plans
intersect/except as aggregate-based anti/semi joins and union-distinct as
union + hash aggregate — one shuffle on the full row each; at scale prefer
pre-projecting to the minimal column set (done here: callers pass
single-column frames) so the shuffled payload is just the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def intersect_sorted(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct rows present in both inputs (SQL INTERSECT)."""
    return a.intersect(b).orderBy(*a.columns)


def except_sorted(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct rows of ``a`` not in ``b`` (SQL EXCEPT).  ``subtract`` is
    Spark's EXCEPT DISTINCT (``exceptAll`` would keep leftover duplicates)."""
    return a.subtract(b).orderBy(*a.columns)


def union_distinct_sorted(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct union (SQL UNION)."""
    return a.unionAll(b).distinct().orderBy(*a.columns)
