"""Join operators — inner/outer/semi/anti/broadcast/interval.

Not present in the reference (single-table engine); part of the declared
relational extension (SURVEY.md §2.2 "Joins").

Scale notes (the part Catalyst can't decide for us):

- **Broadcast the small side explicitly** when we *know* it's a dimension
  table (region: 5 rows, nation: 25).  AQE would usually figure it out from
  runtime stats, but an explicit ``broadcast()`` hint removes the planning
  risk at 100 TB where a mis-planned shuffle join on a fact table is
  catastrophic.
- **Interval/as-of self-joins must carry an equality key.**  A pure range
  condition plans as a broadcast-nested-loop / cartesian; with an equi key
  (``user_id``) Spark plans a shuffled hash / sort-merge join on the key and
  evaluates the range as a post-join filter — per-key work, linear shuffle.
  Skewed keys are handled by AQE skew-join splitting (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    cond=None,
    how: str = "inner",
) -> DataFrame:
    """Equi join with explicit join type: inner/left/right/full/left_semi/
    left_anti.  Thin wrapper — Catalyst picks sort-merge vs shuffled-hash vs
    broadcast from stats + AQE."""
    return left.join(right, on if on is not None else cond, how)


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join with the dimension side broadcast — no shuffle of the fact table.
    Use for small dims (≤ the broadcast threshold, 64 MB in session.py)."""
    return fact.join(F.broadcast(dim), on, how)


def interval_self_join(
    df: DataFrame,
    key: str,
    ts_col: str,
    interval_expr: str,
    left_alias: str = "e1",
    right_alias: str = "e2",
) -> DataFrame:
    """Pairs (a, b) with the same ``key`` and ``b.ts ∈ (a.ts, a.ts + interval]``.

    Written as equi-join on ``key`` + range predicates, never a cartesian:
    the equi key is what keeps the plan a hash/sort-merge join (see module
    docstring).  ``interval_expr`` e.g. ``"INTERVAL 5 MINUTES"``.
    """
    a = df.alias(left_alias)
    b = df.alias(right_alias)
    cond = (
        (F.col(f"{left_alias}.{key}") == F.col(f"{right_alias}.{key}"))
        & (F.col(f"{right_alias}.{ts_col}") > F.col(f"{left_alias}.{ts_col}"))
        & (
            F.col(f"{right_alias}.{ts_col}")
            <= F.expr(f"{left_alias}.{ts_col} + {interval_expr}")
        )
    )
    return a.join(b, cond, "inner")
