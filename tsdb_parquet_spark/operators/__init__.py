"""Relational operator suite (SURVEY.md §2.2).

The reference has no joins, window functions, set ops, or aggregation
functions (its only "aggregation" is the series hash-grouping,
``/root/reference/hello.go:319-366``); this package provides the full
relational extension as thin, scale-annotated compositions of Spark
built-ins — Catalyst/Tungsten do all physical planning (SURVEY.md §4 O9).
"""

from .joins import broadcast_join, equi_join, interval_self_join
from .aggregates import grouped_agg, rollup_agg
from .windows import top_k_per_group, lag_moving_avg, sessionize
from .setops import intersect_sorted, except_sorted, union_distinct_sorted
from .sort import global_top_k
from .prefix import budget_select, distributed_cumsum, interval_concurrency, packed_sequences
from .funnel import cohort_retention, funnel_counts, transition_counts

__all__ = [
    "distributed_cumsum",
    "interval_concurrency",
    "packed_sequences",
    "broadcast_join",
    "equi_join",
    "interval_self_join",
    "grouped_agg",
    "rollup_agg",
    "top_k_per_group",
    "lag_moving_avg",
    "sessionize",
    "intersect_sorted",
    "except_sorted",
    "union_distinct_sorted",
    "global_top_k",
    "budget_select",
    "funnel_counts",
    "cohort_retention",
    "transition_counts",
]
