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

from .operators.aggregates import exact_value_sum
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
        # denominator is count(v) — non-null count — so a NULL sample is
        # skipped by BOTH sum and count, matching standard avg semantics
        # (count(1) would count every row and deflate the average)
        "avg": (exact_value_sum(v) / F.count(v)),
        "min": F.min(v),
        "max": F.max(v),
        "sum": exact_value_sum(v),
        "count": F.count(F.lit(1)).cast("double"),
        "last": F.max_by(v, F.col(TIME_COL)),
    }
    if fn not in exprs:
        raise ValueError(f"unsupported over_time fn {fn!r}")
    return _bucketed(df, window_ms, labels).agg(exprs[fn].alias(f"{fn}_over_time"))


def resets_changes_over_time(
    df: DataFrame,
    window_ms: int,
    labels: list[str] | None = None,
) -> DataFrame:
    """PromQL ``resets(range)`` and ``changes(range)`` per aligned window:
    the number of counter resets (value decreases) and of value changes
    between consecutive samples, counting only pairs whose BOTH samples
    fall in the window (the same in-window-pair rule as ``rate``).

    One lag pass over the (labels) partitioning plus the bucket
    aggregate — Spark plans a single exchange for the chain, identical
    profile to ``rate``.
    """
    labels = labels if labels is not None else label_columns(df)
    w = Window.partitionBy(*labels).orderBy(TIME_COL)
    prev_v = F.lag(VALUE_COL).over(w)
    prev_t = F.lag(TIME_COL).over(w)
    bucket_of = lambda c: (c / F.lit(window_ms)).cast("bigint")  # noqa: E731
    same_bucket = bucket_of(F.col(TIME_COL)) == bucket_of(prev_t)
    in_pair = prev_v.isNotNull() & same_bucket
    reset = F.when(in_pair & (F.col(VALUE_COL) < prev_v), 1).otherwise(0)
    change = F.when(in_pair & (F.col(VALUE_COL) != prev_v), 1).otherwise(0)
    with_flags = df.withColumn("_r", reset).withColumn("_c", change)
    return _bucketed(with_flags, window_ms, labels).agg(
        F.sum("_r").alias("resets"),
        F.sum("_c").alias("changes"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def quantile_over_time(
    df: DataFrame,
    q: float,
    window_ms: int,
    labels: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """PromQL ``quantile_over_time(q, range)``: the φ-quantile
    (linear-interpolated, Prometheus/SQL ``quantile_cont`` semantics) of
    each series' samples per aligned window.

    ``exact=True`` uses ``percentile`` (buffers the window's values per
    group — fine: a window holds minutes of one series, not the table);
    ``exact=False`` switches to ``approx_percentile`` (t-digest,
    mergeable, bounded memory) — the 100 TB path when windows get huge.
    Same single-shuffle profile as the rest of the over_time family.
    """
    if not 0 <= q <= 1:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    labels = labels if labels is not None else label_columns(df)
    v = F.col(VALUE_COL)
    agg = (
        F.expr(f"percentile(value, {q})") if exact
        else F.expr(f"approx_percentile(value, {q})")
    )
    return _bucketed(df, window_ms, labels).agg(
        agg.cast("double").alias("quantile_over_time"),
        F.count(v).alias("n_samples"),
    )


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


def instant_vector(
    df: DataFrame,
    at_ms: int,
    labels: list[str] | None = None,
    staleness_ms: int = 300_000,
) -> DataFrame:
    """PromQL instant-vector evaluation: per series, the most recent sample
    at or before ``at_ms``, but only if it is within the staleness window
    (Prometheus marks a series stale after 5 minutes without a sample).

    Plan: time-range filter (pushed to the scan — on the sorted layout
    this touches only the row groups covering the staleness window, NOT
    all history) → one hash aggregate with ``max_by``.  This is the
    evaluation primitive under every PromQL instant query.
    """
    labels = labels if labels is not None else label_columns(df)
    windowed = df.filter(
        (F.col(TIME_COL) <= at_ms) & (F.col(TIME_COL) > at_ms - staleness_ms)
    )
    return windowed.groupBy(*labels).agg(
        F.max(TIME_COL).alias("sample_time"),
        F.max_by(VALUE_COL, F.col(TIME_COL)).alias(VALUE_COL),
    )


def topk_series(
    df: DataFrame,
    k: int,
    at_ms: int,
    labels: list[str] | None = None,
    staleness_ms: int = 300_000,
) -> DataFrame:
    """PromQL ``topk(k, v)`` at an instant: evaluate the instant vector,
    keep the k series with the largest values (ties broken by labels for
    determinism, D1).  Plans as instant_vector → TakeOrderedAndProject."""
    labels = labels if labels is not None else label_columns(df)
    iv = instant_vector(df, at_ms, labels, staleness_ms)
    order = [F.desc(VALUE_COL)] + [F.asc_nulls_first(c) for c in labels]
    return iv.orderBy(*order).limit(k)


def aggregate_by(
    df: DataFrame,
    op: str,
    by: list[str],
    value_col: str = VALUE_COL,
) -> DataFrame:
    """PromQL aggregation operators — ``sum/avg/min/max/count by (labels)``
    at each instant: group by (time, kept labels), collapse everything
    else.  One shuffle on (time, by); partial aggregation map-side.

    ``sum by (handler) (prometheus_http_requests_total)`` becomes
    ``aggregate_by(df, "sum", ["label_handler"])``.
    """
    v = F.col(value_col)
    exprs = {
        "sum": exact_value_sum(v),
        # count(v) not count(1): NULL samples must not deflate the mean
        "avg": (exact_value_sum(v) / F.count(v)),
        "min": F.min(v),
        "max": F.max(v),
        "count": F.count(F.lit(1)).cast("double"),
    }
    if op not in exprs:
        raise ValueError(f"unsupported aggregation operator {op!r}")
    return df.groupBy(TIME_COL, *by).agg(exprs[op].alias(op))


_BINOPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: F.when(b != 0, a / b),
}


def binary_op(
    left: DataFrame,
    right: DataFrame,
    op: str,
    on: list[str],
    left_value: str = VALUE_COL,
    right_value: str = VALUE_COL,
    result: str = "value",
) -> DataFrame:
    """PromQL vector binary operation with explicit matching labels
    (``on (labels)``): inner-join the two instant vectors on (time,
    matching labels), apply the arithmetic.  Division by zero yields NULL
    (Prometheus drops the sample).  One shuffle per side on the join key —
    at scale pre-partition both selector outputs identically and the join
    co-locates."""
    if op not in _BINOPS:
        raise ValueError(f"unsupported binary operator {op!r}")
    keys = [TIME_COL, *on]
    l = left.select(*keys, F.col(left_value).alias("_lv"))
    r = right.select(*keys, F.col(right_value).alias("_rv"))
    return (
        l.join(r, keys)
        .select(*keys, _BINOPS[op](F.col("_lv"), F.col("_rv")).alias(result))
    )


def range_query(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    labels: list[str] | None = None,
    staleness_ms: int = 300_000,
) -> DataFrame:
    """PromQL RANGE-query evaluation: the step-aligned grid of instant
    evaluations that is every Prometheus graph — ``query_range(selector,
    start, end, step)`` with the 5-minute lookback/staleness rule.  This is
    the reference's stated end-goal surface (``README.md:9``, the Thanos
    PromQL engine) glued together from this module's primitives.

    Plan (ONE job, no per-step loop): each sample serves the grid steps in
    ``[t, t + staleness)`` — a bounded set of ``staleness/step`` steps — so
    we ``sequence()``+``explode`` that per-sample step range map-side (pure
    JVM codegen, no Python), then one hash aggregate on (labels, step_ts)
    picks ``max_by(value, time)``: the latest sample at-or-before each
    step.  Scale: expansion factor is the constant ``staleness/step``; the
    only shuffle is the final aggregate, and the time-range filter prunes
    the scan to [start - staleness, end] row groups on the sorted layout.
    Compare: a steps⨯samples range join re-scans or broadcasts; a per-step
    ``instant_vector`` loop pays one Spark job per step.  Both lose.

    Returns (labels…, step_ts, sample_time, value) — one row per series per
    step where the series is live (has a sample within the lookback), the
    inner-join semantic Prometheus uses.
    """
    labels = labels if labels is not None else label_columns(df)
    n_steps = (end_ms - start_ms) // step_ms
    t = F.col(TIME_COL)
    # steps k with: step_ts >= t  AND  step_ts < t + staleness
    k_min = F.greatest(
        F.lit(0), F.ceil((t - F.lit(start_ms)) / F.lit(step_ms)).cast("bigint")
    )
    k_max = F.least(
        F.lit(n_steps),
        F.floor((t + F.lit(staleness_ms - 1) - F.lit(start_ms)) / F.lit(step_ms)).cast("bigint"),
    )
    return (
        df.filter((t <= end_ms) & (t > start_ms - staleness_ms))
        .filter(k_min <= k_max)  # guard: sequence(hi, lo) would descend
        .withColumn("_k", F.explode(F.sequence(k_min, k_max)))
        .withColumn("step_ts", F.lit(start_ms) + F.col("_k") * F.lit(step_ms))
        .groupBy(*labels, "step_ts")
        .agg(
            F.max(TIME_COL).alias("sample_time"),
            F.max_by(VALUE_COL, F.col(TIME_COL)).alias(VALUE_COL),
        )
    )


def range_rate(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    window_ms: int,
    labels: list[str] | None = None,
) -> DataFrame:
    """``rate(selector[window])`` evaluated over a range-query grid — the
    composition ``rate(x[5m])`` stepped over [start, end].

    Plan: the per-series lag pass computes each adjacent-sample delta ONCE
    (one window shuffle on labels); each sample then explodes over the
    steps whose window contains it (``step_ts ∈ [t, t + window)``, bounded
    ``window/step`` expansion), and the final aggregate per (labels,
    step_ts) sums reset-aware deltas — counting a delta only when its
    *previous* sample also falls inside that step's window — and divides by
    the in-window sample span.  Same "both samples in window" increase
    definition as ``rate`` (documented there); denominator = (max-min)
    sample time, Prometheus's pre-extrapolation span.  Two shuffles total,
    independent of step count.
    """
    labels = labels if labels is not None else label_columns(df)
    n_steps = (end_ms - start_ms) // step_ms
    w = Window.partitionBy(*labels).orderBy(TIME_COL)
    prev_v = F.lag(VALUE_COL).over(w)
    prev_t = F.lag(TIME_COL).over(w)
    d = F.when(prev_v.isNull(), F.lit(0.0)).otherwise(
        F.when(F.col(VALUE_COL) >= prev_v, F.col(VALUE_COL) - prev_v)
        .otherwise(F.col(VALUE_COL))
    )
    t = F.col(TIME_COL)
    with_d = (
        df.filter((t <= end_ms) & (t > start_ms - window_ms))
        .withColumn("_d", d)
        .withColumn("_pt", prev_t)
    )
    k_min = F.greatest(
        F.lit(0), F.ceil((t - F.lit(start_ms)) / F.lit(step_ms)).cast("bigint")
    )
    k_max = F.least(
        F.lit(n_steps),
        F.floor((t + F.lit(window_ms - 1) - F.lit(start_ms)) / F.lit(step_ms)).cast("bigint"),
    )
    exploded = (
        with_d.filter(k_min <= k_max)  # guard: sequence(hi, lo) would descend
        .withColumn("_k", F.explode(F.sequence(k_min, k_max)))
        .withColumn("step_ts", F.lit(start_ms) + F.col("_k") * F.lit(step_ms))
    )
    in_window_d = F.when(
        F.col("_pt") > F.col("step_ts") - F.lit(window_ms), F.col("_d")
    ).otherwise(F.lit(0.0))
    span_s = (F.max(TIME_COL) - F.min(TIME_COL)).cast("double") / 1000.0
    inc = exact_value_sum(in_window_d)
    return exploded.groupBy(*labels, "step_ts").agg(
        inc.alias("increase"),
        F.when(span_s > 0, inc / span_s).otherwise(F.lit(None).cast("double")).alias("rate"),
    )


def histogram_quantile(
    df: DataFrame,
    q: float,
    labels: list[str],
    le_col: str = "label_le",
    time_col: str | None = TIME_COL,
) -> DataFrame:
    """PromQL ``histogram_quantile(q, v)`` over classic ``_bucket`` series:
    per (group labels, instant), linear-interpolate the φ-quantile from
    the cumulative bucket counts keyed by the ``le`` label.

    Prometheus's algorithm exactly: rank = q·total (total = the ``+Inf``
    bucket's cumulative count); the target bucket is the lowest ``le``
    whose count ≥ rank; interpolate between the bucket's bounds — the
    first bucket's lower bound is 0, and a rank landing in the ``+Inf``
    bucket returns the highest finite ``le`` (no upper bound to
    interpolate toward).  Groups with no samples (total = 0) are dropped
    (Prometheus yields NaN; inner-vector semantics here, like
    ``instant_vector``).

    Plan: one window partitioning on (labels, time) ordered by numeric
    ``le`` — lag gives each bucket its lower bound/previous count, max
    gives the total — then a filter keeps the first qualifying bucket.
    Single exchange; buckets-per-series is a small constant (10-100), so
    partitions are tiny and uniform (no skew surface).
    """
    from pyspark.sql import Window

    if not 0 <= q <= 1:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    le_num = F.when(F.col(le_col) == "+Inf", F.lit(float("inf"))).otherwise(
        F.col(le_col).cast("double")
    )
    # time_col=None evaluates one already-instant vector (each group is a
    # single evaluation, e.g. the expression engine's instant path)
    keys = [*labels, *([time_col] if time_col else [])]
    w = Window.partitionBy(*keys).orderBy(le_num.asc())
    wp = Window.partitionBy(*keys)
    v = F.col(VALUE_COL)
    enriched = (
        df.withColumn("_le", le_num)
        .withColumn("_prev_le", F.lag("_le", 1, 0.0).over(w))
        .withColumn("_prev_ct", F.lag(VALUE_COL, 1, 0.0).over(w))
        .withColumn("_total", F.max(VALUE_COL).over(wp))
        .withColumn("_rank", F.lit(q) * F.col("_total"))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy(*keys).orderBy(
                (v < F.col("_rank")).cast("int"), F.col("_le")
            )
        ))
    )
    # the first bucket (by le) with count >= rank sorts to _rn == 1
    hit = enriched.filter((F.col("_rn") == 1) & (F.col("_total") > 0))
    interp = F.col("_prev_le") + (F.col("_le") - F.col("_prev_le")) * (
        (F.col("_rank") - F.col("_prev_ct")) / (v - F.col("_prev_ct"))
    )
    value = (
        F.when(F.col("_le") == float("inf"), F.col("_prev_le"))
        .when(v == F.col("_prev_ct"), F.col("_le"))
        .otherwise(interp)
    )
    return hit.select(*keys, value.alias("quantile"))


def histogram_fraction(
    df: DataFrame,
    upper: float,
    labels: list[str],
    le_col: str = "label_le",
    time_col: str | None = TIME_COL,
) -> DataFrame:
    """Fraction of observations ≤ ``upper`` from classic ``_bucket``
    series — the classic-histogram analog of PromQL's native-histogram
    ``histogram_fraction`` (the SLO arithmetic: "what share of requests
    finished inside the objective?"), and
    :func:`histogram_quantile`'s inverse under the same linear-
    interpolation model: cumulative count at ``upper`` interpolates
    between the enclosing bucket's bounds (first bucket's lower bound
    is 0), divided by the ``+Inf`` total.  ``upper`` at or beyond the
    highest finite ``le`` uses that bucket's exact cumulative count (no
    distribution model inside ``+Inf``).  Empty groups drop
    (inner-vector semantics, as in histogram_quantile).

    Plan: the same single (labels, time) exchange — one lag window for
    bounds/previous counts, a max for the total, one row per group via
    the first-bucket-at-or-above-``upper`` row_number trick.
    """
    from pyspark.sql import Window

    le_num = F.when(F.col(le_col) == "+Inf", F.lit(float("inf"))).otherwise(
        F.col(le_col).cast("double")
    )
    keys = [*labels, *([time_col] if time_col else [])]
    w = Window.partitionBy(*keys).orderBy(le_num.asc())
    wp = Window.partitionBy(*keys)
    v = F.col(VALUE_COL)
    enriched = (
        df.withColumn("_le", le_num)
        .withColumn("_prev_le", F.lag("_le", 1, 0.0).over(w))
        .withColumn("_prev_ct", F.lag(VALUE_COL, 1, 0.0).over(w))
        .withColumn("_total", F.max(VALUE_COL).over(wp))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(
                    (F.col("_le") < F.lit(upper)).cast("int"), F.col("_le")
                )
            ),
        )
    )
    # the first bucket (by le) with le >= upper sorts to _rn == 1; if
    # upper exceeds every finite le that row is the +Inf bucket
    hit = enriched.filter((F.col("_rn") == 1) & (F.col("_total") > 0))
    interp_ct = F.col("_prev_ct") + (v - F.col("_prev_ct")) * (
        (F.lit(upper) - F.col("_prev_le"))
        / (F.col("_le") - F.col("_prev_le"))
    )
    count_at = (
        F.when(F.col("_le") == float("inf"), F.col("_prev_ct"))
        .when(F.col("_le") == F.lit(upper), v)
        .otherwise(interp_ct)
    )
    frac = F.least(F.greatest(count_at / F.col("_total"), F.lit(0.0)), F.lit(1.0))
    return hit.select(*keys, frac.alias("fraction"))


def histogram_stddev(
    df: DataFrame,
    labels: list[str],
    le_col: str = "label_le",
    time_col: str | None = TIME_COL,
    stdvar: bool = False,
) -> DataFrame:
    """``histogram_stddev`` / ``histogram_stdvar`` over CLASSIC
    ``_bucket`` series — the classic-layout analog of the native
    function (upstream Prometheus defines these for native histograms
    only; this engine extends the layout dispatch the way
    ``histogram_fraction`` does).  Engine convention, documented:

    - each bucket's observations sit at its ARITHMETIC midpoint
      ``(prev_le + le)/2`` (classic bounds are linear, not exponential
      — the interpolation model histogram_quantile already uses);
    - the ``+Inf`` bucket is pinned at the highest finite ``le`` (the
      quantile walk's clamp convention);
    - classic buckets carry no ``sum``, so the mean is the midpoint
      estimate ``Σ c·mid / total``;
    - ``variance = Σ c·(mid − mean)² / total``; stddev is its root.

    Plan: one (labels[, time]) exchange — the lag window for bounds and
    per-bucket counts, window sums for mean, one hash aggregate."""
    from pyspark.sql import Window

    le_num = F.when(F.col(le_col) == "+Inf", F.lit(float("inf"))).otherwise(
        F.col(le_col).cast("double")
    )
    keys = [*labels, *([time_col] if time_col else [])]
    w = Window.partitionBy(*keys).orderBy(le_num.asc())
    wp = Window.partitionBy(*keys)
    v = F.col(VALUE_COL)
    enriched = (
        df.withColumn("_le", le_num)
        .withColumn("_prev_le", F.lag("_le", 1, 0.0).over(w))
        .withColumn("_prev_ct", F.lag(VALUE_COL, 1, 0.0).over(w))
        .withColumn("_total", F.max(VALUE_COL).over(wp))
        .withColumn(
            "_maxf",
            F.max(
                F.when(le_num != float("inf"), le_num)
            ).over(wp),
        )
    )
    c = v - F.col("_prev_ct")
    mid = F.when(
        F.col("_le") == float("inf"), F.col("_maxf")
    ).otherwise((F.col("_prev_le") + F.col("_le")) / F.lit(2.0))
    enriched = (
        enriched.withColumn("_c", c)
        .withColumn("_mid", mid)
        .withColumn(
            "_mean",
            F.sum(F.col("_c") * F.col("_mid")).over(wp) / F.col("_total"),
        )
    )
    g = (
        enriched.filter(F.col("_total") > 0)
        .groupBy(*keys)
        .agg(
            F.first("_total").alias("_n"),
            F.sum(
                F.col("_c")
                * (F.col("_mid") - F.col("_mean"))
                * (F.col("_mid") - F.col("_mean"))
            ).alias("_sq"),
        )
    )
    var = F.col("_sq") / F.col("_n")
    val = var if stdvar else F.sqrt(var)
    return g.select(*keys, val.alias("stddev" if not stdvar else "stdvar"))


def label_replace(
    df: DataFrame,
    dst_label: str,
    replacement: str,
    src_label: str,
    regex: str,
) -> DataFrame:
    """PromQL ``label_replace(v, dst, replacement, src, regex)``: if the
    anchored ``regex`` matches ``src``'s value, set ``dst`` to
    ``replacement`` with ``$1``-style group references expanded; otherwise
    leave ``dst`` unchanged.  Pure projection (regexp_extract-style JVM
    expression), no shuffle."""
    src = F.coalesce(F.col(f"label_{src_label}"), F.lit(""))
    anchored = f"^(?:{regex})$"
    dst_col = f"label_{dst_label}"
    existing = F.col(dst_col) if dst_col in df.columns else F.lit(None).cast("string")
    # regexp_replace takes Java-style $1 group refs; PromQL's replacement
    # syntax is also $1 — passes through verbatim
    replaced = F.regexp_replace(src, anchored, replacement)
    return df.withColumn(
        dst_col, F.when(src.rlike(anchored), replaced).otherwise(existing)
    )


def label_join(
    df: DataFrame,
    dst_label: str,
    separator: str,
    *src_labels: str,
) -> DataFrame:
    """PromQL ``label_join(v, dst, sep, src...)``: concatenate the source
    label values with ``sep`` into ``dst``.  Absent labels join as empty
    strings (Prometheus semantics).  Pure projection."""
    parts = [F.coalesce(F.col(f"label_{s}"), F.lit("")) for s in src_labels]
    return df.withColumn(f"label_{dst_label}", F.concat_ws(separator, *parts))


def predict_linear(
    df: DataFrame,
    at_ms: int,
    window_ms: int,
    horizon_s: float,
    labels: list[str] | None = None,
) -> DataFrame:
    """PromQL ``predict_linear(v[window], horizon)``: per series, simple
    least-squares over the samples in ``(at - window, at]``, extrapolated
    ``horizon_s`` seconds past ``at`` — the capacity-planning function
    (gauges only, like Prometheus).

    One hash aggregate computes the regression moments (Σt, Σv, Σtv, Σt²)
    per series — ``regr_slope``/``regr_intercept`` built-ins, pure codegen,
    single shuffle.  Time is centered on ``at`` in SECONDS before the
    moments (exactly Prometheus's formulation) so the slope/intercept stay
    in well-conditioned float range.  Series with one sample (undefined
    slope) return NULL.
    """
    labels = labels if labels is not None else label_columns(df)
    t = F.col(TIME_COL)
    windowed = df.filter((t <= at_ms) & (t > at_ms - window_ms))
    # centered seconds: x = (t - at)/1000
    x = (t - F.lit(at_ms)).cast("double") / 1000.0
    v = F.col(VALUE_COL)
    slope = F.regr_slope(v, x)
    intercept = F.regr_intercept(v, x)
    return windowed.groupBy(*labels).agg(
        (intercept + slope * F.lit(horizon_s)).alias("predicted"),
        slope.alias("slope"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def holt_winters(
    df: DataFrame,
    at_ms: int,
    window_ms: int,
    sf: float,
    tf: float,
    labels: list[str] | None = None,
) -> DataFrame:
    """PromQL ``holt_winters(v[range], sf, tf)`` (double exponential
    smoothing) at an instant: per series, run the level/trend recurrence
    over the samples in ``(at - window, at]`` and return the final
    smoothed value.

    The recurrence (``s_i = sf·v_i + (1-sf)(s_{i-1} + b_{i-1})``) is
    inherently sequential per series — the one operator family the
    DataFrame algebra can't express — so this is the designated
    ``applyInPandas`` path (SURVEY.md §7.2): Arrow-batched, one pandas
    group per series, vectorized inside the group, series-parallel across
    executors.  Series with fewer than 2 samples are dropped (undefined
    trend), matching Prometheus.
    """
    import pandas as pd

    labels = labels if labels is not None else label_columns(df)
    if not 0 < sf < 1 or not 0 < tf < 1:
        raise ValueError("sf and tf must be in (0, 1)")
    t = F.col(TIME_COL)
    windowed = df.filter((t <= at_ms) & (t > at_ms - window_ms)).select(
        *labels, TIME_COL, VALUE_COL
    )
    out_schema = ", ".join(
        [f"`{c}` string" for c in labels] + ["value double", "n_samples bigint"]
    )

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(TIME_COL)
        v = pdf[VALUE_COL].to_numpy()
        if len(v) < 2:
            return pd.DataFrame(columns=list(pdf.columns[: len(labels)]) + ["value", "n_samples"])
        s, b = v[0], v[1] - v[0]
        for x in v[1:]:
            s_prev = s
            s = sf * x + (1 - sf) * (s + b)
            b = tf * (s - s_prev) + (1 - tf) * b
        row = {c: [pdf[c].iloc[0]] for c in labels}
        row["value"] = [float(s)]
        row["n_samples"] = [len(v)]
        return pd.DataFrame(row)

    return windowed.groupBy(*labels).applyInPandas(_smooth, schema=out_schema)


def rate(
    df: DataFrame,
    window_ms: int,
    labels: list[str] | None = None,
    pin: bool = True,
) -> DataFrame:
    """PromQL ``rate``/``increase`` per aligned window, reset-aware: sum of
    positive deltas (a reset contributes the post-reset value) divided by
    the in-window sample span.

    Two window passes sharing one (labels) partitioning: lag for deltas,
    then the bucket groupBy — Spark plans a single exchange, PINNED
    (operators/partitioning.pin_partitioning) so AQE byte-coalescing
    can't shrink the sort/window parallelism (measured 2.3x at sf10).
    The (labels, bucket) groupBy consumes the labels partitioning — hash
    on a subset of the grouping keys satisfies its distribution.
    """
    from .operators.partitioning import pin_partitioning

    labels = labels if labels is not None else label_columns(df)
    if pin:
        df = pin_partitioning(df, labels)
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
    inc = exact_value_sum(F.col("_d"))
    return _bucketed(with_d, window_ms, labels).agg(
        inc.alias("increase"),
        F.when(span_s > 0, inc / span_s).otherwise(F.lit(None).cast("double")).alias("rate"),
    )


def rate_agg(
    df: DataFrame,
    window_ms: int,
    labels: list[str] | None = None,
    pin: bool = True,
) -> DataFrame:
    """:func:`rate` as ONE hash aggregate — no window operator.

    The key observation: ``rate``'s delta counts only when BOTH samples
    fall in the same aligned bucket, so grouping by (labels, bucket) and
    sorting each group's samples inside the aggregate reproduces exactly
    the same adjacent pairs (a bucket is a contiguous time range, so
    in-bucket-consecutive == series-consecutive).  One exchange carrying
    (labels, bucket)-grouped arrays replaces exchange+sort+window+agg;
    delta summation is the scale-6 long-unit exact path inlined as a JVM
    higher-order lambda.  Bit-identical to :func:`rate`.  Memory bound:
    one bucket of one series per array — window_ms caps it, so this form
    is safe even for very long series (unlike ``counter_rate_agg``'s
    whole-series arrays).
    """
    from .operators.partitioning import pin_partitioning

    labels = labels if labels is not None else label_columns(df)
    # collect_list shuffles full rows (no partial reduction): pin the
    # exchange on the same grounds as rate()'s
    if pin:
        df = pin_partitioning(df, labels)
    grouped = _bucketed(df, window_ms, labels).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(TIME_COL).alias("t"), F.col(VALUE_COL).alias("v"))
            )
        ).alias("_tv")
    )
    units = F.expr(
        """
        aggregate(
          zip_with(slice(_tv, 2, greatest(size(_tv) - 1, 0)),
                   slice(_tv, 1, greatest(size(_tv) - 1, 0)),
                   (a, b) -> CAST(CAST((CASE WHEN a.v >= b.v THEN a.v - b.v
                                             ELSE a.v END) AS DECIMAL(18,6))
                             * 1000000 AS LONG)),
          CAST(0 AS LONG), (acc, x) -> acc + x)
        """
    )
    inc = (units.cast("decimal(38,6)") / F.lit(10**6)).cast("double")
    span_s = (
        F.element_at("_tv", -1)["t"] - F.element_at("_tv", 1)["t"]
    ).cast("double") / 1000.0
    return grouped.select(
        *labels,
        "bucket",
        inc.alias("increase"),
        F.when(span_s > 0, inc / span_s)
        .otherwise(F.lit(None).cast("double"))
        .alias("rate"),
    )
