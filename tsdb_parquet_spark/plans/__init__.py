"""Plan auditing — the engine's `.explain` introspection toolkit.

The 100 TB posture (SCALE.md) is enforced as PLAN SHAPE, not hope:
pushdown reaches the scan, dims broadcast, facts never broadcast, top-k
avoids global sorts, windows reuse one partitioning.  This package turns
those invariants into assertable facts — used by tests/test_plans.py and
exposed on the CLI (``python -m tsdb_parquet_spark.cli explain``).
"""

from .audit import (
    count_exchanges,
    count_nodes,
    has_cartesian,
    plan_string,
    pushed_filters,
    read_schema,
    summarize,
)

__all__ = [
    "plan_string",
    "pushed_filters",
    "read_schema",
    "count_exchanges",
    "count_nodes",
    "has_cartesian",
    "summarize",
]
