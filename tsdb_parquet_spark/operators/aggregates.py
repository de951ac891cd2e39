"""Aggregation operators — grouped multi-agg, exact distinct, rollup/cube.

Not in the reference (SURVEY.md §2.2 "Aggregations"); Spark's hash aggregate
runs partial (map-side) + final (post-shuffle) automatically, so a groupBy
over 100 TB shuffles only one partial-aggregate row per (task, group), not
the raw rows.

Determinism convention D2: measures are cast to DECIMAL **before** summing
(exact, order-independent — float sums depend on partition order), and the
result is emitted as DOUBLE so Spark's and DuckDB's output types agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decimal_sum(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent exact sum emitted as DOUBLE, on the primitive
    fast path: each row is cast to DECIMAL(p,s) (the exact HALF_UP decimal
    rounding of the double — same per-row value as the boxed form), scaled
    to integer 10^-s units in a LONG, and summed as a primitive long —
    whole-stage codegen, no boxed BigDecimal accumulator (measured 1.4-1.6x
    the boxed throughput on 60M-row aggregates at sf10).  The group total
    is rebuilt with ONE exact decimal division per group, so the emitted
    double is bit-identical to SUM(CAST(x AS DECIMAL(p,s)))::DOUBLE
    (verified bit-equal against the boxed form over sf10; the division
    result carries >= s fractional digits at every Spark precision-loss
    adjustment, so it is exact).

    Bounds (documented engine contract): |x| < 10^(p-s) per row — beyond
    that the DECIMAL(p,s) cast overflows (use ``decimal_sum_boxed`` with a
    wider precision); |group sum| < 2^63 / 10^s (~9.2e14 at s=4, ~9.2e12
    at s=6) — beyond that the long accumulator wraps; the boxed form is
    the escape hatch there too.
    """
    c = F.col(col) if isinstance(col, str) else col
    unit = 10**scale
    u = (c.cast(f"decimal({precision},{scale})") * unit).cast("long")
    return (F.sum(u).cast(f"decimal(38,{scale})") / F.lit(unit)).cast("double")


def decimal_sum_boxed(
    col: Column | str, precision: int = 28, scale: int = 6
) -> Column:
    """The boxed-decimal exact sum — the wide-magnitude escape hatch for
    values or group totals beyond ``decimal_sum``'s long-unit bounds."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_value_sum(col: Column | str) -> Column:
    """``decimal_sum`` at the engine's value-column convention (scale 6) —
    the drop-in for every SUM(CAST(value AS DECIMAL(28,6)))::DOUBLE site.
    Bit-identical output for |value| < 10^12 and |group sum| < ~9.2e12
    (the tsdb fixture's max |value| is ~1.1e6)."""
    return decimal_sum(col, precision=18, scale=6)


# A string no real label value plausibly contains — disambiguates NULL
# from any value inside the hashed grouping key (xxhash64 SKIPS null
# inputs, so without it (NULL,'x') and ('x',NULL) would collide).
NULL_SENTINEL = "\x00\x01\x7f_NULL"


def hashed_group_key(df: DataFrame, cols: list[str]) -> Column:
    """One 64-bit ``xxhash64`` column standing in for a multi-column
    (typically multi-STRING) grouping key.

    Why: a hash aggregate probes its map with the full grouping-key row —
    hashing + memcmp over N variable-length strings per input row; the
    8-byte fixed-width key probes cheaper (q06 shape at sf10: 1.47 s vs
    2.18 s when the output does NOT need the original columns).

    WHEN IT PAYS (measured, SCALE.md round-7): only when the original key
    columns do NOT appear in the output — e.g. a pre-filter/candidate
    count, or when a persisted key→labels dimension already exists to
    join back.  Carrying the strings through as ``first()`` aggregates
    looks free but is NOT: any variable-length aggregate buffer drops
    HashAggregate to **SortAggregate** (a full per-partition sort of the
    input), measured 4.7 s vs the exact key's 2.2 s on the sf10 q06 —
    which is why ``regroup_series_stats``/``downsample`` keep the exact
    multi-string key.

    Null safety: string columns are coalesced to :data:`NULL_SENTINEL`
    before hashing (xxhash64 skips nulls, which would otherwise merge
    (NULL,'x') with ('x',NULL)); non-string columns contribute an
    explicit ``isnull`` flag instead.

    Collision bound (the exactness trade): distinct key-sets colliding on
    64 bits merge SILENTLY.  P(any collision) ≈ n²/2^65 for n groups —
    3e-13 at 10³ groups, 3e-6 at 10⁷.  Use only below ~10⁷ groups;
    beyond that keep the exact key (or add a second seeded hash column
    for a 128-bit bound).
    """
    dtypes = dict(df.dtypes)
    parts: list[Column] = []
    for c in cols:
        col = F.col(c)
        if dtypes.get(c) == "string":
            parts.append(F.coalesce(col, F.lit(NULL_SENTINEL)))
        else:
            parts.append(col)
            parts.append(F.isnull(col).cast("int"))
    return F.xxhash64(*parts)


def money_units(col: Column | str, decimals: int = 2) -> Column:
    """Exact integer units for a NON-NEGATIVE fixed-point DOUBLE column
    (money: at most ``decimals`` true fractional digits) as a primitive
    LONG: ``floor(x * 10^d + 0.5)`` — pure JVM double arithmetic inside
    whole-stage codegen, no BigDecimal boxing anywhere.

    Why it is exact: a d-dp value stored as a double is within one ulp of
    its decimal value, so ``x * 10^d`` lands within ~1e-9 of the integer
    ``N`` of units and ``floor(N ± eps + 0.5) == N``.  Measured at sf10
    (60M lineitem rows): 0.41 s for the global unit sum vs 1.42 s through
    the ``decimal(18,s)`` cast and 1.13 s through ``F.round`` (both box
    per row) — 3.5x, with bit-identical group totals (q09 A/B).

    Contract: non-negative inputs only (floor(x+0.5) is round-half-UP,
    which matches the decimal cast's HALF_UP only for x >= 0) and truly
    fixed-point data — for arbitrary-precision doubles (e.g. the tsdb
    value column) use :func:`decimal_sum`, whose per-row HALF_UP rounding
    at scale s is the documented semantics, not a data assumption."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**decimals) + F.lit(0.5))


def grouped_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """groupBy().agg() with explicit aliased aggregate columns."""
    return df.groupBy(*keys).agg(*aggs)


def exact_count_distinct(df: DataFrame, keys: list[str], col: str, alias: str) -> DataFrame:
    """Exact COUNT(DISTINCT col) per group.

    Plan-shape finding (r12, verdict r11 #4 measured): Catalyst already
    rewrites the single-distinct aggregate INTO the distinct-collapse
    form — ``F.countDistinct`` and ``distinct().groupBy().count()``
    compile to byte-identical physical plans (map-side partial dedup on
    (keys, col), exchange on the FULL pair tuple — full parallelism,
    not a group-key-skewed shuffle — then a second pair-row exchange on
    keys).  Same-session sf100 A/B: 9.9 s vs 9.5 s, inside noise.  The
    residual vs DuckDB is the pair exchange itself, which an in-process
    engine never materializes; the engine's scale answer is the at-rest
    layout (q16_bucketed: value-bucketed input makes the wide exchange
    vanish — hash(col) co-locates every (keys, col) pair).  At 100 TB
    prefer ``approx_count_distinct`` (HLL) unless exactness is required
    (the approximate form is engine surface but never oracle-declared,
    SURVEY.md §2.3)."""
    return df.groupBy(*keys).agg(F.countDistinct(col).alias(alias))


def cube_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    grouping_aliases: list[str] | None = None,
) -> DataFrame:
    """CUBE over ``keys`` (every subset combination) with GROUPING()
    indicators — same plan shape as rollup: Spark expands the grouping
    sets before the hash aggregate, so the shuffle carries one partial row
    per (expanded set, group), not the raw input."""
    return df.cube(*keys).agg(
        *[
            F.grouping(k).cast("int").alias(a)
            for k, a in zip(keys, grouping_aliases or [f"g{i+1}" for i in range(len(keys))])
        ],
        *aggs,
    )


def median_percentiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    percentiles: list[float] = (0.9,),
    round_dp: int = 4,
) -> DataFrame:
    """Exact per-group median + continuous percentiles (linear
    interpolation — the same definition DuckDB's MEDIAN/QUANTILE_CONT use).
    Exact percentile buffers each group's values; at 100 TB prefer
    ``approx_percentile`` (t-digest sketch, bounded memory, mergeable —
    engine surface but never oracle-declared, SURVEY.md §2.3)."""
    aggs = [F.round(F.median(col), round_dp).alias("med")]
    for p in percentiles:
        aggs.append(
            F.round(F.percentile(col, F.lit(p)), round_dp).alias(f"p{int(p * 100)}")
        )
    return df.groupBy(*keys).agg(*aggs)


def rollup_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    grouping_aliases: list[str] | None = None,
) -> DataFrame:
    """ROLLUP over ``keys`` with GROUPING() indicator columns (cast to INT so
    the oracle's type matches — Spark emits TINYINT, DuckDB BIGINT)."""
    out = df.rollup(*keys).agg(
        *[
            F.grouping(k).cast("int").alias(a)
            for k, a in zip(keys, grouping_aliases or [f"g{i+1}" for i in range(len(keys))])
        ],
        *aggs,
    )
    return out


def exact_moment_stats(
    df,
    group_cols: list[str],
    value_col: str = "value",
    unit: float = 1e-6,
    round_dp: int = 6,
):
    """Mean / population variance / skewness / excess kurtosis per group
    from EXACT integer raw moments — the engine-portable form of the
    built-in ``stddev``/``skewness``/``kurtosis`` aggregates, whose
    native implementations legitimately differ across engines (one-pass
    Welford vs two-pass vs textbook; float partial-merge order): values
    scale to integer ``unit`` steps, the four raw power sums accumulate
    as DECIMAL(38,0), and each statistic is ONE fixed double expression
    over exact integers, identical everywhere.

    PICK ``unit`` FOR THE 4TH POWER: the S4 sum must fit 38 digits
    (DuckDB's HUGEINT tops out similarly), so
    ``(max|v|/unit)^4 * rows_per_group <= ~9e37`` — e.g. values up to
    ~500 with million-row groups need ``unit=1e-3`` (milli-steps: S4
    ~1e29), NOT the 1e-6 default other ops use (S4 ~1e41 overflows to
    NULL).  The unit is the value RESOLUTION; the emitted statistics
    keep full double precision of that resolution.

    Formulas (population, from raw moments): with m = S1/n,
    var = S2/n - m^2; skew = (S3/n - 3 m S2/n + 2 m^3) / var^1.5;
    kurt = (S4/n - 4 m S3/n + 6 m^2 S2/n - 3 m^4) / var^2 - 3.
    Zero-variance groups emit NULL skew/kurt.  One hash aggregate.
    """
    from pyspark.sql import functions as F

    u = F.floor(F.col(value_col) / F.lit(unit) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    d = df.select(*group_cols, u.alias("_x"))
    agg = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_x").alias("_s1"),
        F.sum(F.col("_x") * F.col("_x")).alias("_s2"),
        F.sum(F.col("_x") * F.col("_x") * F.col("_x")).alias("_s3"),
        F.sum(F.col("_x") * F.col("_x") * F.col("_x") * F.col("_x")).alias("_s4"),
    )
    n = F.col("_n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    s4 = F.col("_s4").cast("double")
    m = s1 / n
    var = s2 / n - m * m
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * m * m * m) / F.pow(var, 1.5)
    kurt = (
        s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m
    ) / (var * var) - 3
    scale = F.lit(unit)
    return agg.select(
        *group_cols,
        F.col("_n").cast("long").alias("n"),
        F.round(m * scale, round_dp).alias("mean"),
        F.round(var * scale * scale, round_dp).alias("var_pop"),
        F.when(var > 0, F.round(skew, round_dp)).alias("skew"),
        F.when(var > 0, F.round(kurt, round_dp)).alias("kurt_excess"),
    )


def weighted_percentile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    percents: list[int],
    keys: list[str] | None = None,
) -> DataFrame:
    """Exact weighted percentiles per key: the smallest value whose
    cumulative weight reaches p% of the key's total weight — the
    token-weighted median/p95 a corpus report needs ("the doc length
    below which 95% of TOKENS live"), which unweighted percentiles
    (Q32) and t-digest sketches don't answer exactly.

    Exactness: ``percents`` are INTEGER percunits and weights integer
    counts, so the reach test is pure integer arithmetic
    (``100*cumw >= p*total``) — no float threshold can land on a
    binary-representation boundary differently across engines.  Values
    are only ORDERED and picked, never combined, so any value dtype
    hashes exactly.

    Shape: percentiles depend only on the TOTAL weight per (key,
    value), so the row stream first collapses through a parallel hash
    aggregate — the windows then run over (key, distinct-value) rows,
    not raw rows.  That sidesteps the low-cardinality-key window trap:
    with 3 keys over 60 M rows the naive per-row window is 3 single-task
    20 M-row sorts (measured 69 s at sf10; 4.5 s pre-aggregated).  For
    keys whose DISTINCT-value count itself explodes, bucket the value
    range first (operators/prefix.distributed_cumsum's machinery).
    Ties in the value collapse by construction.
    """
    from pyspark.sql import Window

    keys = keys or []
    if not percents:
        raise ValueError("percents must be non-empty")
    for p in percents:
        if not (isinstance(p, int) and 0 < p <= 100):
            raise ValueError(f"percents must be integers in (0, 100]: {p}")
    wgt = F.col(weight_col).cast("long")
    per_value = df.groupBy(*keys, value_col).agg(F.sum(wgt).alias("_wp_w"))
    w_ord = Window.partitionBy(*keys).orderBy(value_col)
    w_all = Window.partitionBy(*keys)
    d = per_value.withColumn(
        "_wp_cum",
        F.sum("_wp_w").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("_wp_tot", F.sum("_wp_w").over(w_all))
    return d.groupBy(*keys).agg(
        F.sum("_wp_w").alias("total_weight"),
        *[
            F.min(
                F.when(
                    F.col("_wp_cum") * 100 >= F.lit(int(p)) * F.col("_wp_tot"),
                    F.col(value_col),
                )
            ).alias(f"p{p}")
            for p in percents
        ],
    )


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Latest-row-wins compaction (the CDC/SCD-1 "current view" over an
    append-only change log): one row per key — the one with the highest
    ``version_col`` (ties to the highest ``tiebreak_col``).

    Executed as a single ``max_by(struct(payload), struct(version,
    tiebreak))`` aggregate.  The payload struct is a VARIABLE-WIDTH
    buffer, so this is the documented SortAggregate fallback (SCALE.md
    §5b) — but partial+final combine still holds: each task locally
    sorts its own input slice and ships ONE candidate row per (task,
    key), where the row_number-over-window form most SQL dialects
    reach for shuffles every key's FULL history and then sorts it.
    Shuffle volume ~ |keys|, not |rows|.  (version, tiebreak) must be
    unique per key for a deterministic result — pass the change-log
    sequence number as the tiebreak.
    """
    payload = [c for c in df.columns if c not in keys]
    ord_cols = [F.col(version_col)]
    if tiebreak_col is not None:
        ord_cols.append(F.col(tiebreak_col))
    out = df.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.struct(*ord_cols)
        ).alias("_lk")
    )
    return out.select(*keys, *[F.col(f"_lk.{c}").alias(c) for c in payload])


def trailing_window_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
    day_alias: str = "day_num",
    out_alias: str = "active",
) -> DataFrame:
    """Rolling N-day distinct keys per day (trailing WAU/MAU): for each
    epoch-day D, how many distinct keys appeared in [D-N+1, D] — the
    retention dashboard's rolling-active-users curve.

    The naive forms both fail at scale: a per-day self-join re-scans N
    days per day, and an exact distinct over a sliding RANGE window
    buffers per-partition key sets.  This is the CREDIT-FORWARD form:
    collapse to distinct (key, day) pairs (one partial-combining
    aggregate), credit each pair to the N trailing window-ends it
    participates in (a bounded ``sequence`` explode — x N rows of two
    integers, map-side), and count distinct keys per window-end (the
    distinct is exact; rows entering it are already (key, day)-unique
    per window, so it is a plain count after the second collapse).
    Cost is linear in activity x N with no window state.  Days past the
    observed maximum (incomplete trailing windows) are trimmed via one
    driver int.

    Day boundaries are UTC epoch days (integer ``floor(epoch/86400)``)
    — engine-portable, no calendar/timezone surface.
    """
    day = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast(
        "bigint"
    )
    ud = df.select(F.col(key_col).alias("_k"), day.alias("_d")).distinct()
    max_day = ud.agg(F.max("_d")).first()[0]  # one driver int
    if max_day is None:
        return df.sparkSession.createDataFrame(
            [], f"{day_alias} bigint, {out_alias} bigint"
        )
    credited = ud.select(
        "_k",
        F.explode(
            F.sequence(F.col("_d"), F.col("_d") + F.lit(window_days - 1))
        ).alias(day_alias),
    ).filter(F.col(day_alias) <= F.lit(int(max_day)))
    return (
        credited.groupBy(day_alias)
        .agg(F.count_distinct(F.col("_k")).alias(out_alias))
    )
