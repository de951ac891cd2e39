"""PromQL-flavored range-vector functions over the wide tsdb layout — the
query-language direction the reference names as its end goal
(``/root/reference/README.md:9``: research toward the Thanos PromQL
engine) but never implements.  Selectors come from ``matchers.
parse_selector``; these are the per-window aggregations layered on top.

Everything is built-ins over one window/groupBy shape: bucket samples
into aligned windows of ``window_ms``, then per (series, window) compute
the function.  One shuffle on (labels, bucket) — identical scale profile
to ``timeseries.downsample``.

Implemented: ``avg_over_time``, ``min_over_time``, ``max_over_time``,
``sum_over_time``, ``count_over_time``, ``last_over_time``, ``delta``
(last - first, gauges), ``increase``/``rate`` (reset-aware, counters —
see ``timeseries.counter_rate`` for the whole-span form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeseries import TIME_COL, VALUE_COL, label_columns


def _bucketed(df: DataFrame, window_ms: int, labels: list[str]):
    bucket = (F.col(TIME_COL) / F.lit(window_ms)).cast("bigint").alias("bucket")
    return df.groupBy(*labels, bucket)


def over_time(
    df: DataFrame,
    fn: str,
    window_ms: int,
    labels: list[str] | None = None,
) -> DataFrame:
    """``<fn>_over_time(range)`` for fn ∈ avg/min/max/sum/count/last —
    per series, per aligned window."""
    labels = labels if labels is not None else label_columns(df)
    v = F.col(VALUE_COL)
    exprs = {
        "avg": (F.sum(v.cast("decimal(28,6)")).cast("double") / F.count(F.lit(1))),
        "min": F.min(v),
        "max": F.max(v),
        "sum": F.sum(v.cast("decimal(28,6)")).cast("double"),
        "count": F.count(F.lit(1)).cast("double"),
        "last": F.max_by(v, F.col(TIME_COL)),
    }
    if fn not in exprs:
        raise ValueError(f"unsupported over_time fn {fn!r}")
    return _bucketed(df, window_ms, labels).agg(exprs[fn].alias(f"{fn}_over_time"))


def delta(
    df: DataFrame,
    window_ms: int,
    labels: list[str] | None = None,
) -> DataFrame:
    """PromQL ``delta``: last - first per (series, window).  For gauges —
    no reset semantics."""
    labels = labels if labels is not None else label_columns(df)
    v = F.col(VALUE_COL)
    return _bucketed(df, window_ms, labels).agg(
        (F.max_by(v, F.col(TIME_COL)) - F.min_by(v, F.col(TIME_COL))).alias("delta")
    )


def rate(
    df: DataFrame,
    window_ms: int,
    labels: list[str] | None = None,
) -> DataFrame:
    """PromQL ``rate``/``increase`` per aligned window, reset-aware: sum of
    positive deltas (a reset contributes the post-reset value) divided by
    the in-window sample span.

    Two window passes sharing one (labels) partitioning: lag for deltas,
    then the bucket groupBy — Spark plans a single exchange.
    """
    labels = labels if labels is not None else label_columns(df)
    w = Window.partitionBy(*labels).orderBy(TIME_COL)
    prev_v = F.lag(VALUE_COL).over(w)
    prev_t = F.lag(TIME_COL).over(w)
    bucket_of = lambda c: (c / F.lit(window_ms)).cast("bigint")  # noqa: E731
    # a delta counts toward a window only if both samples fall in it;
    # the window's first sample contributes its post-reset/edge semantics
    # exactly as Prometheus's extrapolated rate does NOT — this is the
    # simpler "sum of in-window deltas" definition, documented as such
    same_bucket = bucket_of(F.col(TIME_COL)) == bucket_of(prev_t)
    d = F.when(
        prev_v.isNull() | ~same_bucket, F.lit(0.0)
    ).otherwise(
        F.when(F.col(VALUE_COL) >= prev_v, F.col(VALUE_COL) - prev_v)
        .otherwise(F.col(VALUE_COL))
    )
    with_d = df.withColumn("_d", d)
    span_s = (F.max(TIME_COL) - F.min(TIME_COL)).cast("double") / 1000.0
    inc = F.sum(F.col("_d").cast("decimal(28,6)")).cast("double")
    return _bucketed(with_d, window_ms, labels).agg(
        inc.alias("increase"),
        F.when(span_s > 0, inc / span_s).otherwise(F.lit(None).cast("double")).alias("rate"),
    )
