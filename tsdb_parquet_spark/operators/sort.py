"""Global sort + limit (top-k).

Not in the reference as a query operator (its sorting is the storage layout,
``/root/reference/hello.go:148-155``).  Spark plans ``orderBy(...).limit(k)``
as TakeOrderedAndProject: each partition computes its local top-k, only
k rows per partition reach the driver-side merge — no global shuffle of the
data, which is exactly the plan you want for top-k over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def global_top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Total-order top-k.  ``order_by`` must end with a unique tiebreaker
    (determinism convention D1) or the cut at rank k is nondeterministic."""
    return df.orderBy(*order_by).limit(k)
