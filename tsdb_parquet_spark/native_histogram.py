"""Prometheus NATIVE (sparse, exponential-bucket) histograms — the
modern sample type the classic ``_bucket``/``le`` machinery predates
(verdict r11 #8).

Reference scope: the converter iterates float samples only
(``hello.go:489-497`` walks ``chunkenc.ValFloat``), so native
histograms are an EXTENSION surface here, not reference parity — this
module lands the schema and the quantile machinery so a Prometheus 3.x
user has somewhere to put native-histogram data.

The model (the standard exponential schema): a native histogram sample
is ``(count, sum, zero_count, schema, buckets)`` where ``buckets`` is a
SPARSE array of ``(k, c)`` pairs and bucket ``k`` covers
``(base^(k-1), base^k]`` with ``base = 2^(2^-schema)``.  Any
``schema`` resolution is supported on the float path (r13); the
plumbing (sparse array column, cumulative walk, within-bucket linear
interpolation) is resolution-independent.

EXACT BUCKETING: for integer-valued observations at schema 0 the
bucket index ``k = ceil(log2(v))`` is computed WITHOUT floating logs —
``v = 1 -> 0``, else ``length(bin(v - 1))`` (the bit-length identity
``ceil(log2(v)) = bit_length(v-1)``) — so Spark and any replaying
engine agree bit-for-bit at every power-of-two boundary, where a libm
``log2`` can land one ulp off and flip the bucket (the q155/q156 ulp
lesson applied to bucketing).  FLOAT observations (r13, q165f) take
``ceil(log2(v) * 2^schema)`` with a one-step correction against the
bucket-bound powers — bit-exact at schema 0 (integer-exponent ``pow``
is IEEE-exact), self-consistent with each engine's ``pow`` at finer
schemas (boundary agreement to 1 ulp of ``pow`` — documented
residual).

Scale shape: building histograms is ONE groupBy over (labels, k) —
shuffle carries one row per populated bucket per label set (sparse:
~64 buckets max for long-range data at schema 0), then a collect_list
per label set.  The quantile walk runs on the BUCKET rows (label-set ×
populated-bucket cardinality — thousands, not raw-sample billions):
a per-label cumulative window + first-bucket pick + one interpolation.
Raw samples cross the exchange once, pre-aggregated to bucket counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_index_exact(value_col) -> "F.Column":
    """schema-0 bucket index ``k = ceil(log2(v))`` for INTEGER v >= 1,
    via the bit-length identity — no floating log anywhere."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        F.when(v == 1, F.lit(0))
        .otherwise(F.length(F.bin(v - F.lit(1))))
        .cast("int")
    )


def bucket_index_exact_float(value_col, schema: int = 0) -> "F.Column":
    """Bucket index ``k = ceil(log2(v) * 2^schema)`` for FLOAT v > 0 —
    bucket k covers ``(base^(k-1), base^k]`` with ``base =
    2^(2^-schema)``.  Despite the floating log the index is pinned by a
    one-step CORRECTION against the bucket-bound powers: libm ``log2``
    is within 1 ulp, so the candidate is off by at most one, and
    comparing v against ``pow(2, (k-1)/2^s)`` / ``pow(2, k/2^s)``
    decides the true bucket.

    At ``schema = 0`` the bound exponents are integers, ``pow`` is
    IEEE-exact in every engine, and the bucketing is bit-exact at every
    boundary (no tolerance convention at all).  At ``schema > 0`` the
    bounds are irrational powers: the correction makes the index
    self-consistent with each engine's own ``pow``, and engines agree
    except for observations within 1 ulp of a fractional-power boundary
    (the documented residual — Prometheus itself buckets these with
    native float math).  ``k <= 0`` for v < 1 — the negative-index span
    of the exponential schema."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    vd = v.cast("double")
    sf = float(1 << schema)
    k0 = F.ceil(F.log2(vd) * F.lit(sf)).cast("int")
    p_lo = F.pow(F.lit(2.0), (k0 - F.lit(1)).cast("double") / F.lit(sf))
    p_hi = F.pow(F.lit(2.0), k0.cast("double") / F.lit(sf))
    return (
        F.when(p_lo >= vd, k0 - F.lit(1))
        .when(p_hi < vd, k0 + F.lit(1))
        .otherwise(k0)
        .cast("int")
    )


def native_histogram_from_values(
    df: DataFrame,
    value_col: str,
    labels: list[str],
    float_obs: bool = False,
    schema: int = 0,
) -> DataFrame:
    """Aggregate observations into one native-histogram row per label
    set: ``(labels..., count, sum, zero_count, schema, buckets)`` with
    ``buckets`` a k-sorted sparse ``array<struct<k int, c long>>``
    — the storage schema a native-histogram ingest would persist.
    Zero/negative observations land in ``zero_count`` (the Prometheus
    zero bucket; negative-bucket spans are symmetrical and omitted
    here).

    ``float_obs``: integer mode (default) buckets ``v >= 1`` via the
    bit-length identity; float mode buckets every ``v > 0`` via
    :func:`bucket_index_exact_float` — values in (0, 1) take the
    schema's NEGATIVE bucket indices instead of the zero bucket, and
    ``sum`` is the float sum of the positive observations.

    ``schema``: the exponential resolution (bucket k covers
    ``(base^(k-1), base^k]``, ``base = 2^(2^-schema)`` — finer buckets
    at higher schema, the Prometheus resolution ladder).  Non-zero
    schema requires ``float_obs=True`` (the integer bit-length identity
    is a schema-0 construction)."""
    if schema != 0 and not float_obs:
        raise ValueError("schema != 0 requires float_obs=True "
                         "(the bit-length identity is schema-0 only)")
    v = F.col(value_col)
    if float_obs:
        pos = df.filter(v > 0).withColumn(
            "_k", bucket_index_exact_float(v, schema)
        )
    else:
        pos = df.filter(v >= 1).withColumn("_k", bucket_index_exact(v))
    per_bucket = pos.groupBy(*labels, "_k").agg(
        F.count(F.lit(1)).alias("_c"), F.sum(v).alias("_s")
    )
    zero = (
        df.filter((v <= 0) if float_obs else (v < 1))
        .groupBy(*labels)
        .agg(F.count(F.lit(1)).alias("zero_count"))
    )
    hist = per_bucket.groupBy(*labels).agg(
        F.sum("_c").alias("pos_count"),
        F.sum("_s").alias("sum"),
        F.array_sort(
            F.collect_list(F.struct(F.col("_k").alias("k"), F.col("_c").alias("c")))
        ).alias("buckets"),
    )
    # FULL outer: a label set whose observations are all < 1 has no
    # positive-bucket row at all — it must still emit a histogram
    # (count == zero_count, empty buckets), not vanish from the output
    out = (
        hist.join(zero, labels, "full")
        .withColumn(
            "zero_count", F.coalesce(F.col("zero_count"), F.lit(0)).cast("long")
        )
        .withColumn(
            "pos_count", F.coalesce(F.col("pos_count"), F.lit(0)).cast("long")
        )
        .withColumn("sum", F.coalesce(F.col("sum"), F.lit(0)))
        .withColumn(
            "buckets",
            F.coalesce(
                F.col("buckets"),
                F.expr("CAST(array() AS array<struct<k: int, c: bigint>>)"),
            ),
        )
    )
    return out.select(
        *labels,
        (F.col("pos_count") + F.col("zero_count")).alias("count"),
        "sum",
        "zero_count",
        F.lit(schema).alias("schema"),
        "buckets",
    )


_EMPTY_BUCKETS = "CAST(array() AS array<struct<k: int, c: bigint>>)"

# The non-label payload columns of a histogram-valued row/vector.
HIST_COLS = ("count", "sum", "zero_count", "schema", "buckets")

# Merge a flattened multiset of per-pair delta arrays into one k-sorted
# sparse array: collect_list order is nondeterministic, but array_sort
# makes the multiset canonical before the fold, and integer sums commute
# — the merged array is deterministic.  Shared by the instant and
# range-grid increase aggregates.
_MERGED_FOLD = """
    filter(
      aggregate(
        array_sort(_all),
        CAST(array() AS array<struct<k: int, c: bigint>>),
        (acc, x) -> CASE
          WHEN size(acc) > 0 AND element_at(acc, -1).k = x.k
          THEN concat(slice(acc, 1, size(acc) - 1),
                      array(struct(x.k AS k,
                                   element_at(acc, -1).c + x.c AS c)))
          ELSE concat(acc, array(x)) END),
      b -> b.c <> 0)
    """


def _pair_deltas(
    df: DataFrame, labels: list[str], time_col: str, pin: bool
) -> DataFrame:
    """Per-sample reset-aware ADJACENT-PAIR deltas over a native-
    histogram series — the shared first stage of the instant and
    range-grid temporal operators.  Adds to each sample row:

    - ``_pt``: the previous sample's time (null on the series head)
    - ``_dc``/``_dz``/``_ds``: count / zero_count / sum delta vs the
      previous sample (null on the head; on a whole-sample counter
      reset the baseline is 0 — the ``counter_rate`` restart
      convention, ``timeseries.py:313``)
    - ``_db``: the sparse per-bucket delta array (union of both
      samples' keys, reset-aware; empty on the head)

    Reset detection is WHOLE-SAMPLE: total ``count`` or ``zero_count``
    decreasing, or ANY bucket's cumulative count decreasing (including
    a bucket present before and absent after).  One exchange: the
    pinned labels repartition feeds the per-series lag window; the
    delta arrays are built by JVM higher-order functions (map lookups
    over the sparse arrays — no explode, no Python)."""
    from pyspark.sql import Window

    from .operators.partitioning import pin_partitioning

    if pin:
        df = pin_partitioning(df, labels)
    w = Window.partitionBy(*labels).orderBy(time_col)
    d = (
        df.withColumn("_pt", F.lag(time_col).over(w))
        .withColumn("_pc", F.lag("count").over(w))
        .withColumn("_pz", F.lag("zero_count").over(w))
        .withColumn("_ps", F.lag("sum").over(w))
        .withColumn("_pb", F.lag("buckets").over(w))
        .withColumn("_cm", F.map_from_entries("buckets"))
        .withColumn(
            "_pm",
            F.map_from_entries(F.coalesce("_pb", F.expr(_EMPTY_BUCKETS))),
        )
    )
    reset = F.col("_pc").isNotNull() & (
        (F.col("count") < F.col("_pc"))
        | (F.col("zero_count") < F.col("_pz"))
        | F.exists(
            "_pb",
            lambda b: F.coalesce(F.element_at(F.col("_cm"), b["k"]), F.lit(0))
            < b["c"],
        )
    )
    d = d.withColumn("_reset", reset)

    def _delta(cur, prev):
        return (
            F.when(F.col("_pc").isNull(), F.lit(None))
            .when(F.col("_reset"), cur)
            .otherwise(cur - prev)
        )

    keys = F.array_sort(
        F.array_union(
            F.transform("buckets", lambda b: b["k"]),
            F.transform(
                F.coalesce("_pb", F.expr(_EMPTY_BUCKETS)), lambda b: b["k"]
            ),
        )
    )
    delta_buckets = F.when(
        F.col("_pc").isNull(), F.expr(_EMPTY_BUCKETS)
    ).otherwise(
        F.transform(
            keys,
            lambda k: F.struct(
                k.alias("k"),
                (
                    F.coalesce(F.element_at(F.col("_cm"), k), F.lit(0))
                    - F.when(F.col("_reset"), F.lit(0)).otherwise(
                        F.coalesce(F.element_at(F.col("_pm"), k), F.lit(0))
                    )
                ).alias("c"),
            ),
        )
    )
    return (
        d.withColumn("_dc", _delta(F.col("count"), F.col("_pc")))
        .withColumn("_dz", _delta(F.col("zero_count"), F.col("_pz")))
        .withColumn("_ds", _delta(F.col("sum"), F.col("_ps")))
        .withColumn("_db", delta_buckets)
    )


def native_histogram_increase(
    df: DataFrame,
    labels: list[str],
    time_col: str = "time",
    pin: bool = True,
) -> DataFrame:
    """Reset-aware ``increase()`` over a native-histogram SERIES — the
    temporal half of the native-histogram surface (verdict r13 #1): per
    label set, sum per-bucket deltas across adjacent samples, detecting
    Prometheus counter resets at WHOLE-SAMPLE granularity (a reset
    restarts every counter in the histogram at once: total ``count``
    or ``zero_count`` decreasing, or ANY bucket's cumulative count
    decreasing — including a bucket present before and absent after).
    On a reset pair the previous sample's baseline is 0 (the
    ``counter_rate`` restart convention, ``timeseries.py:313``); the
    ``sum`` counter follows the same detection (it is NOT itself a
    reset signal — legitimate negative observations can lower it).

    Input rows: ``(labels..., time, count, sum, zero_count, schema,
    buckets)`` with cumulative counters, the storage schema
    :func:`native_histogram_from_values` emits per sample.  The caller
    applies the range-window time filter first.  Output: one row per
    label set with >= 2 samples — ``(labels..., count, sum,
    zero_count, schema, buckets, span_s)`` where every value is the
    exact integer increase over the window (``sum`` exact when
    observations are integral) and ``buckets`` keeps only k with a
    non-zero increase.

    Plan: ONE exchange total.  The pinned labels repartition feeds the
    per-series lag window; per-pair delta arrays are built by JVM
    higher-order functions (map lookups over the sparse arrays — no
    explode, no Python); the groupBy on the same label keys reuses the
    window's partitioning (zero further exchanges) and merges the
    per-pair delta arrays with a sorted fold.  Per-series state is one
    range-window of samples — the same bound Prometheus holds.
    """
    d = _pair_deltas(df, labels, time_col, pin)
    agg = d.groupBy(*labels).agg(
        F.sum("_dc").alias("count"),
        F.sum("_ds").alias("sum"),
        F.sum("_dz").alias("zero_count"),
        F.first("schema").alias("schema"),
        ((F.max(time_col) - F.min(time_col)).cast("double") / 1000.0).alias(
            "span_s"
        ),
        F.flatten(F.collect_list("_db")).alias("_all"),
    )
    merged = F.expr(_MERGED_FOLD)
    return (
        agg.filter(F.col("count").isNotNull())  # >= 2 samples
        .withColumn("buckets", merged)
        .select(*labels, *HIST_COLS, "span_s")
    )


def native_histogram_rate(
    df: DataFrame,
    labels: list[str],
    time_col: str = "time",
    pin: bool = True,
) -> DataFrame:
    """``rate()`` over a native-histogram series: the increase divided
    by the window span (the ``counter_rate`` convention — span is
    last-minus-first sample time, no boundary extrapolation).  Every
    payload turns double: ``count``/``zero_count``/``sum`` and each
    bucket's ``c``.  The quantile walk is scale-invariant, so
    ``histogram_quantile(q, rate(m[w]))`` == the quantile of the
    increase — but accessors (``histogram_count``/``_sum``) genuinely
    differ, hence both entry points."""
    inc = native_histogram_increase(df, labels, time_col=time_col, pin=pin)
    s = F.col("span_s")
    return inc.filter(s > 0).select(
        *labels,
        (F.col("count").cast("double") / s).alias("count"),
        (F.col("sum") / s).alias("sum"),
        (F.col("zero_count").cast("double") / s).alias("zero_count"),
        "schema",
        F.transform(
            "buckets",
            lambda b: F.struct(
                b["k"].alias("k"), (b["c"].cast("double") / s).alias("c")
            ),
        ).alias("buckets"),
        "span_s",
    )


def _explode_covering_steps(
    df: DataFrame,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    reach_ms: int,
    time_col: str,
) -> DataFrame:
    """Explode each sample over the grid steps whose ``reach_ms``
    lookback contains it — ``step_ts ∈ [t, t + reach)`` clamped to the
    grid, a bounded ``reach/step`` expansion independent of step count
    (the float ``promql.range_rate`` composition's explode, shared by
    the two native-histogram grid operators).  Adds ``step_ts``."""
    t = F.col(time_col)
    n_steps = (end_ms - start_ms) // step_ms
    k_min = F.greatest(
        F.lit(0),
        F.ceil((t - F.lit(start_ms)) / F.lit(step_ms)).cast("bigint"),
    )
    k_max = F.least(
        F.lit(n_steps),
        F.floor(
            (t + F.lit(reach_ms - 1) - F.lit(start_ms)) / F.lit(step_ms)
        ).cast("bigint"),
    )
    return (
        df.filter(k_min <= k_max)
        .withColumn("_k", F.explode(F.sequence(k_min, k_max)))
        .withColumn("step_ts", F.lit(start_ms) + F.col("_k") * F.lit(step_ms))
    )


def native_histogram_range_increase(
    df: DataFrame,
    labels: list[str],
    start_ms: int,
    end_ms: int,
    step_ms: int,
    window_ms: int,
    time_col: str = "time",
    pin: bool = True,
) -> DataFrame:
    """``increase(m[w])`` over a native-histogram series evaluated on a
    RANGE-QUERY step grid (verdict r14 #2 — the Grafana-panel form) —
    one histogram-valued row per (label set, step) with >= 2 in-window
    samples: ``(labels..., step_ts, count, sum, zero_count, schema,
    buckets, span_s)``.

    Plan — the float ``promql.range_rate`` composition applied to the
    histogram payload, ONE composed plan with no per-step jobs: the
    per-series lag pass computes each adjacent-pair reset-aware delta
    ONCE (:func:`_pair_deltas`, one exchange); each sample explodes
    over the steps whose lookback window contains it (``step_ts ∈ [t,
    t + window)`` — a bounded ``window/step`` expansion independent of
    step count); the per-(labels, step_ts) aggregate counts a pair's
    delta only when the PREVIOUS sample also falls inside that step's
    window (in-window samples are consecutive in the series, so the
    masked pairs are exactly the window's adjacent pairs) and merges
    the masked delta arrays with the same sorted fold as the instant
    path.  The final groupBy keys extend the window's hash
    partitioning (labels ⊂ labels+step_ts), so no second exchange.
    ``span_s`` is last-minus-first in-window sample time — every
    exploded row for a step IS an in-window sample."""
    t = F.col(time_col)
    win = df.filter((t <= end_ms) & (t > start_ms - window_ms))
    d = _pair_deltas(win, labels, time_col, pin)
    exploded = _explode_covering_steps(
        d, start_ms, end_ms, step_ms, window_ms, time_col
    )
    # a pair counts toward this step iff its previous sample is also in
    # the step's lookback window (strict >, the instant filter's bound)
    m = F.col("_pt").isNotNull() & (
        F.col("_pt") > F.col("step_ts") - F.lit(window_ms)
    )
    agg = exploded.groupBy(*labels, "step_ts").agg(
        F.sum(F.when(m, F.col("_dc"))).alias("count"),
        F.sum(F.when(m, F.col("_ds"))).alias("sum"),
        F.sum(F.when(m, F.col("_dz"))).alias("zero_count"),
        F.first("schema").alias("schema"),
        ((F.max(time_col) - F.min(time_col)).cast("double") / 1000.0).alias(
            "span_s"
        ),
        F.flatten(
            F.collect_list(F.when(m, F.col("_db")))
        ).alias("_all"),
    )
    return (
        agg.filter(F.col("count").isNotNull())  # >= 1 in-window pair
        .withColumn("buckets", F.expr(_MERGED_FOLD))
        .select(*labels, "step_ts", *HIST_COLS, "span_s")
    )


def native_histogram_range_rate(
    df: DataFrame,
    labels: list[str],
    start_ms: int,
    end_ms: int,
    step_ms: int,
    window_ms: int,
    time_col: str = "time",
    pin: bool = True,
) -> DataFrame:
    """``rate(m[w])`` on the step grid: the per-step increase divided
    by its in-window sample span (the ``counter_rate`` convention —
    no boundary extrapolation).  Same plan as the increase; every
    payload turns double."""
    inc = native_histogram_range_increase(
        df, labels, start_ms, end_ms, step_ms, window_ms,
        time_col=time_col, pin=pin,
    )
    s = F.col("span_s")
    return inc.filter(s > 0).select(
        *labels,
        "step_ts",
        (F.col("count").cast("double") / s).alias("count"),
        (F.col("sum") / s).alias("sum"),
        (F.col("zero_count").cast("double") / s).alias("zero_count"),
        "schema",
        F.transform(
            "buckets",
            lambda b: F.struct(
                b["k"].alias("k"), (b["c"].cast("double") / s).alias("c")
            ),
        ).alias("buckets"),
        "span_s",
    )


def native_histogram_range_vector(
    df: DataFrame,
    labels: list[str],
    start_ms: int,
    end_ms: int,
    step_ms: int,
    staleness_ms: int,
    time_col: str = "time",
) -> DataFrame:
    """A native-histogram SELECTOR on the step grid: per (label set,
    step), the latest whole sample within the staleness lookback — the
    float ``range_query`` generalized to the histogram payload, feeding
    the accessor trio / quantile / fraction in range queries.  Same
    bounded explode: each sample covers steps in ``[t, t + staleness)``
    and the per-step ``max_by(time)`` keeps the newest."""
    t = F.col(time_col)
    win = df.filter((t <= end_ms) & (t > start_ms - staleness_ms))
    exploded = _explode_covering_steps(
        win, start_ms, end_ms, step_ms, staleness_ms, time_col
    )
    return exploded.groupBy(*labels, "step_ts").agg(
        *[F.max_by(c, t).alias(c) for c in HIST_COLS]
    )


def native_histogram_stddev(
    hist_df: DataFrame,
    labels: list[str],
    stdvar: bool = False,
    round_dp: int | None = 6,
) -> DataFrame:
    """Prometheus ``histogram_stddev`` / ``histogram_stdvar`` over a
    native-histogram vector — the last two histogram functions
    (verdict r14 #3).  Upstream semantics (promql/functions.go
    ``funcHistogramStdDev``): each bucket's observations are modeled at
    the bucket's GEOMETRIC midpoint ``sqrt(lower*upper)`` (the zero
    bucket at 0), the mean is the TRUE mean ``sum/count``, and

        variance = (zero_count·mean² + Σ_b c_b·(mid_b − mean)²) / count

    EXACT REPLAY: at schema 0 the bounds ``2^(k-1)``/``2^k`` are exact
    integer powers and ``sqrt`` is IEEE correctly-rounded, so ``mid`` is
    bit-identical in any engine; the remaining float ops mirror the
    oracle's parenthesization and the 6dp round absorbs the summation-
    order residual (~1e-12 relative on sparse buckets).  Label sets
    with count 0 drop (inner-vector convention; Prometheus yields NaN).

    Plan: one explode to bucket rows (sparse — tens per series), one
    hash aggregate; no window, no Python."""
    b = hist_df.select(
        *labels,
        "count",
        "sum",
        "zero_count",
        "schema",
        F.explode_outer("buckets").alias("_b"),
    )
    sf = F.pow(F.lit(2.0), F.col("schema").cast("double"))
    lower = F.pow(F.lit(2.0), (F.col("_b.k") - 1).cast("double") / sf)
    upper = F.pow(F.lit(2.0), F.col("_b.k").cast("double") / sf)
    mid = F.sqrt(lower * upper)
    mean = F.col("sum") / F.col("count")
    contrib = F.col("_b.c") * (mid - mean) * (mid - mean)
    g = (
        b.filter(F.col("count") > 0)
        .groupBy(*labels)
        .agg(
            F.first("count").alias("_n"),
            F.first("sum").alias("_s"),
            F.first("zero_count").alias("_z"),
            F.sum(F.coalesce(contrib, F.lit(0.0))).alias("_sq"),
        )
    )
    m = F.col("_s") / F.col("_n")
    var = (F.col("_z") * m * m + F.col("_sq")) / F.col("_n")
    val = var if stdvar else F.sqrt(var)
    if round_dp is not None:
        val = F.round(val, round_dp)
    return g.select(*labels, val.alias("value"))


def histogram_accessors(hist_df: DataFrame, labels: list[str]) -> DataFrame:
    """The Prometheus accessor trio over a histogram-valued vector
    (``histogram_count`` / ``histogram_sum`` / ``histogram_avg``):
    ``(labels..., h_count, h_sum, h_avg)`` with ``h_avg = sum/count``.
    Works over raw samples, increases, or rates alike — pure column
    arithmetic, no shuffle."""
    return hist_df.select(
        *labels,
        F.col("count").cast("double").alias("h_count"),
        F.col("sum").cast("double").alias("h_sum"),
        (F.col("sum") / F.col("count")).cast("double").alias("h_avg"),
    )


def native_histogram_fraction(
    hist_df: DataFrame,
    upper: float,
    labels: list[str],
    round_dp: int | None = 6,
    schema: int = 0,
) -> DataFrame:
    """``histogram_fraction(0, upper, <native histogram>)``: per label
    set, the interpolated share of observations at or under ``upper``
    — the classic-bucket q122 arithmetic on the sparse schema.  The
    containing bucket index ``ceil(log2(upper) * 2^schema)`` and its
    bounds are computed DRIVER-SIDE in Python with the same
    candidate-then-correct convention as the engine-side bucketing
    (exact at schema 0 — integer powers; self-consistent at finer
    schemas), then folded in as literals: buckets wholly below count
    fully, the containing bucket contributes its linear share, the
    zero bucket counts fully.  ``schema`` must match the histogram's
    (the hist rows carry it).  Returns ``(labels..., fraction)``."""
    import math

    if upper <= 0:
        raise ValueError("upper must be positive (zero bucket is the floor)")
    sf = float(1 << schema)
    k = math.ceil(math.log2(upper) * sf)
    if 2.0 ** ((k - 1) / sf) >= upper:
        k -= 1
    elif 2.0 ** (k / sf) < upper:
        k += 1
    lo, hi = 2.0 ** ((k - 1) / sf), 2.0 ** (k / sf)
    part = (upper - lo) / (hi - lo)
    b = hist_df.select(
        *labels,
        "count",
        "zero_count",
        F.explode("buckets").alias("_b"),
    )
    contrib = (
        F.when(F.col("_b.k") < k, F.col("_b.c").cast("double"))
        .when(F.col("_b.k") == k, F.col("_b.c") * F.lit(part))
        .otherwise(F.lit(0.0))
    )
    frac = (F.first("zero_count") + F.sum(contrib)) / F.first("count")
    # round_dp=None: the raw fraction, for callers that combine two
    # bounds — rounding each bound first would put up to ~1e-6 of error
    # into the difference (advice r14); the caller rounds ONCE at the end
    if round_dp is not None:
        frac = F.round(frac, round_dp)
    return b.groupBy(*labels).agg(frac.alias("fraction"))


def native_histogram_fraction_expr(
    hist_df: DataFrame,
    lo: float,
    hi: float,
    labels: list[str],
    round_dp: int | None = 6,
) -> DataFrame:
    """``histogram_fraction(lo, hi, <native histogram>)`` as ONE
    aggregation pass with ROW-SIDE schema arithmetic — the expression
    evaluator's fraction kernel (r15: the dispatch previously
    collect()ed the schema off the evaluated vector and walked it once
    per bound, evaluating the upstream subtree up to three times; on a
    range grid that upstream is the whole pair-delta pipeline).

    The containing bucket index for each bound is computed per row
    from the row's own ``schema`` (``ceil(log2(u) * 2^schema)`` with
    the one-step candidate correction of
    :func:`bucket_index_exact_float` — ``log2(u)`` is a driver
    literal, everything else JVM columns), so mixed-schema vectors
    work and no driver job runs.  Both bounds' contributions aggregate
    in the SAME pass; ``lo = 0`` contributes nothing on the lower
    side, reproducing :func:`native_histogram_fraction`'s arithmetic
    bit-for-bit at schema 0.  Empty vector in → empty vector out;
    ``explode_outer`` keeps all-zero-bucket label sets.  Returns
    ``(labels..., value)``."""
    import math

    if hi <= 0:
        raise ValueError("hi must be positive (zero bucket is the floor)")

    sf = F.pow(F.lit(2.0), F.col("schema").cast("double"))

    def _bound(u: float):
        k0 = F.ceil(F.lit(math.log2(u)) * sf).cast("int")
        p_lo = F.pow(F.lit(2.0), (k0 - F.lit(1)).cast("double") / sf)
        p_hi = F.pow(F.lit(2.0), k0.cast("double") / sf)
        k = (
            F.when(p_lo >= F.lit(u), k0 - F.lit(1))
            .when(p_hi < F.lit(u), k0 + F.lit(1))
            .otherwise(k0)
            .cast("int")
        )
        lo_b = F.pow(F.lit(2.0), (k - F.lit(1)).cast("double") / sf)
        hi_b = F.pow(F.lit(2.0), k.cast("double") / sf)
        part = (F.lit(u) - lo_b) / (hi_b - lo_b)
        return k, part

    b = hist_df.select(
        *labels,
        "count",
        "zero_count",
        "schema",
        F.explode_outer("buckets").alias("_b"),
    )
    bk = F.col("_b.k")
    bc = F.col("_b.c").cast("double")

    def _contrib(u: float):
        k, part = _bound(u)
        return F.coalesce(
            F.when(bk < k, bc).when(bk == k, bc * part).otherwise(F.lit(0.0)),
            F.lit(0.0),
        )

    aggs = [F.sum(_contrib(hi)).alias("_chi")]
    if lo > 0:
        aggs.append(F.sum(_contrib(lo)).alias("_clo"))
    g = b.groupBy(*labels).agg(
        F.first("zero_count").alias("_z"),
        F.first("count").alias("_n"),
        *aggs,
    )
    frac_hi = (F.col("_z") + F.col("_chi")) / F.col("_n")
    if lo > 0:
        val = frac_hi - (F.col("_z") + F.col("_clo")) / F.col("_n")
    else:
        val = frac_hi
    if round_dp is not None:
        val = F.round(val, round_dp)
    return g.select(*labels, val.alias("value"))


def native_histogram_quantile(
    hist_df: DataFrame,
    q: float,
    labels: list[str],
    round_dp: int = 6,
) -> DataFrame:
    """``histogram_quantile(q, <native histogram>)``: per label set,
    walk the sparse buckets cumulatively, pick the first bucket whose
    cumulative count reaches ``rank = q * count`` (zero bucket first —
    observations <= 0 all sit at 0), and interpolate linearly within
    the bucket's ``(base^(k-1), base^k]`` bounds with ``base =
    2^(2^-schema)`` read from the hist rows — the Prometheus
    within-bucket model at any resolution (schema 0 reduces to exact
    integer powers of two).  Returns ``(labels..., value)``.  Runs on
    bucket rows, never raw samples.

    SINGLE-PASS plan (r15): the zero-bucket hit (``rank <=
    zero_count`` → quantile 0) is a CASE on the first qualifying walk
    row, not a separate ``union`` branch — the r14 shape evaluated the
    whole upstream subtree TWICE (two exchanges, no reuse; at the end
    of the range-grid pipeline that doubled the pair-delta work).
    ``explode_outer`` keeps bucket-less label sets (all mass at the
    zero point) as a null-k row so they still emit."""
    b = hist_df.select(
        *labels,
        F.col("count"),
        F.col("zero_count"),
        F.col("schema"),
        F.explode_outer("buckets").alias("_b"),
    ).select(
        *labels,
        "count",
        "zero_count",
        "schema",
        F.col("_b.k").alias("k"),
        F.col("_b.c").alias("c"),
    )
    w = (
        Window.partitionBy(*labels)
        .orderBy(F.asc_nulls_first("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rank = F.lit(q) * F.col("count")
    cum = (
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w)
        + F.col("zero_count")
    ).alias("cum")
    walked = b.select(
        *labels, "count", "zero_count", "schema", "k", "c",
        cum, rank.alias("rank"),
    )
    # the first bucket whose cumulative count reaches rank; when rank
    # sits inside the zero bucket (rank <= zero_count) EVERY row
    # qualifies and the first row carries the 0.0 case below
    first = (
        walked.filter(F.col("cum") >= F.col("rank"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*labels).orderBy(F.asc_nulls_first("k"))
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    # (k-1)/2^schema: at schema 0 the division by 1.0 is exact, so the
    # bounds stay the bit-exact integer powers of two
    sf = F.pow(F.lit(2.0), F.col("schema").cast("double"))
    lower = F.pow(F.lit(2.0), (F.col("k") - 1).cast("double") / sf)
    upper = F.pow(F.lit(2.0), F.col("k").cast("double") / sf)
    frac = (F.col("rank") - (F.col("cum") - F.col("c"))) / F.col("c")
    val = (
        F.when(
            (F.col("rank") <= F.col("zero_count")) | F.col("k").isNull(),
            F.lit(0.0),
        )
        .otherwise(F.round(lower + (upper - lower) * frac, round_dp))
    )
    return first.select(*labels, val.alias("value"))
