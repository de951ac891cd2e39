"""Skew mitigation — salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles skewed JOINs, but a
skewed GROUP BY key still lands every row of the hot key in one reducer,
and window partitions can't be split at all.  Salting is the standard
mitigation (SURVEY.md §2.2/SCALE.md §4): spread each key over
``num_salts`` sub-keys, aggregate partially per sub-key, then combine.

Only algebraic aggregates (count/sum/min/max — anything with an
associative combine) can be salted this way; holistic aggregates
(median, exact distinct) need different machinery (expand + two-phase
count-distinct is what Spark itself plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial expression, combine function) per supported aggregate
_COMBINES = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output alias → (kind, column), kind ∈ {count, sum, min,
    max}; e.g. ``{"n": ("count", ""), "sv": ("sum", "value")}``.

    Phase 1 groups on (keys, random salt) — the hot key's rows spread over
    ``num_salts`` reducers; phase 2 combines the ≤ num_salts partial rows
    per key.  The second shuffle carries only partials: |keys| ×
    num_salts rows, regardless of input size.

    The salt uses a deterministic per-row hash (monotonically_increasing_id
    is partition-stable), so results are reproducible.
    """
    for alias, (kind, _) in aggs.items():
        if kind not in _COMBINES:
            raise ValueError(f"{alias}: unsupported salted aggregate {kind!r}")

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    partial_exprs = []
    final_exprs = []
    for alias, (kind, col) in aggs.items():
        partial_fn, combine_fn = _COMBINES[kind]
        src = F.col(col) if isinstance(col, str) and col else col
        partial_exprs.append(
            (partial_fn(src) if kind != "count" else partial_fn(None)).alias(f"_p_{alias}")
        )
        final_exprs.append(combine_fn(F.col(f"_p_{alias}")).alias(alias))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_running_agg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    kind: str = "sum",
    chunk_span: int = 3_600_000,
    out: str = "running",
) -> DataFrame:
    """Skew-safe RUNNING aggregate (cumulative sum/count/min/max per key
    ordered by time) — the window-function twin of ``salted_agg``.

    Why: ``Window.partitionBy(key)`` puts EVERY row of a hot key in one
    task, and unlike joins, AQE cannot split a window partition (SCALE.md
    §4's shuffle inventory) — a single key with 10^9 rows stalls the
    stage.  The fix is the classic distributed prefix-sum, expressed in
    three bounded steps:

    1. chunk each key's timeline by ``chunk_span`` (same granularity knob
       as ``timeseries.downsample``) and run the window INSIDE (key,
       chunk) — the hot key now spreads over its chunks;
    2. aggregate one total per (key, chunk) — tiny — and prefix-combine
       the PRECEDING chunks' totals with a window over that tiny relation
       (≤ #chunks rows per key);
    3. broadcast-join the per-chunk offsets back and combine with the
       intra-chunk running value.

    Supported kinds are the associative ones (sum/count/min/max), same
    restriction as ``salted_agg``.  Results equal the plain
    ``Window.partitionBy(key).orderBy(ts)`` form (asserted in
    tests/test_skew_layout_promql.py) whenever ``ts`` is unique per key —
    ties across a chunk boundary order by chunk, ties within a chunk by
    the engine's row order, exactly like the unsalted window.
    """
    from pyspark.sql import Window

    if kind not in _COMBINES:
        raise ValueError(f"unsupported running aggregate {kind!r}")
    partial_fn, _ = _COMBINES[kind]
    combine_col = {
        "sum": lambda a, b: a + b,
        "count": lambda a, b: a + b,
        "min": F.least,
        "max": F.greatest,
    }[kind]
    src = F.col(value_col)
    chunk = (F.col(ts_col) / F.lit(chunk_span)).cast("bigint").alias("_chunk")
    chunked = df.withColumn("_chunk", chunk)

    w_intra = (
        Window.partitionBy(*keys, "_chunk")
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = chunked.withColumn(
        "_intra", (partial_fn(src) if kind != "count" else F.count(F.lit(1))).over(w_intra)
    )

    totals = chunked.groupBy(*keys, "_chunk").agg(
        (partial_fn(src) if kind != "count" else F.count(F.lit(1))).alias("_tot")
    )
    w_prefix = (
        Window.partitionBy(*keys)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("_off", _COMBINES[kind][1](F.col("_tot")).over(w_prefix)).drop("_tot")

    joined = intra.join(F.broadcast(offsets), [*keys, "_chunk"], "left")
    running = F.when(F.col("_off").isNull(), F.col("_intra")).otherwise(
        combine_col(F.col("_intra"), F.col("_off"))
    )
    return joined.withColumn(out, running).drop("_chunk", "_intra", "_off")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
) -> DataFrame:
    """Manual salted join for when AQE skew-split is unavailable (e.g.
    non-AQE engines or broadcast-too-big dims): the skewed side gets a
    random salt, the small side is exploded ``num_salts``× so every salted
    key finds its match.  Join key becomes (key, salt) — the hot key's
    rows spread across reducers at the cost of replicating the small side.
    """
    salted_big = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_big.join(exploded_small, [key, "_salt"]).drop("_salt")
