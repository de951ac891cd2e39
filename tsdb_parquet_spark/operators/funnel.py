"""Event-sequence analytics: funnels and cohort retention.

The product-analytics pair every event store grows (Amplitude/Mixpanel
class, `SELECT ... MATCH_RECOGNIZE` territory in ANSI): how many users
progress through an ORDERED sequence of event types, and how cohorts
(users grouped by first-activity period) stay active over subsequent
periods.  Neither is a plain windowed aggregate — the funnel's "step i
strictly after step i-1" recurrence and retention's self-relative
offsets both tempt row-at-a-time code; here both stay JVM-side.

100 TB shapes:

- ``funnel_counts``: one hash aggregate keyed by user (the scan filter
  ``event_type IN steps`` is pushed down, so only funnel events move),
  a higher-order-function fold over each user's time-sorted step
  events, and a metadata-sized final rollup.  Per-user state is two
  scalars; the collected list is bounded by that user's FUNNEL events
  — for adversarial per-user skew (bot traffic), pre-dedupe
  ``(user, step, ts)`` or fall back to the k-aggregate min-cascade the
  oracle uses (k shuffles, no lists).
- ``cohort_retention``: ONE full-data shuffle (the per-user
  ``collect_set`` of active periods — bounded by the number of
  periods, i.e. tiny), then explode + a count-shaped aggregate over
  (cohort, offset) — never a user x period join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ts_micros(df: DataFrame, ts_col: str) -> Column:
    """``ts_col`` as epoch-microseconds, dtype-checked.

    TIMESTAMP / TIMESTAMP_NTZ / DATE / string go through
    ``unix_micros(cast)``; a NUMERIC column is rejected loudly — under
    a bare ``cast("timestamp")`` Spark would read it as epoch-SECONDS,
    silently shrinking ``within_ms``/``gap_ms`` 1000x when the source
    follows this repo's epoch-ms ``TIME_COL`` convention.  Callers with
    numeric timestamps convert explicitly (e.g.
    ``timestamp_millis(ts)``) so the unit is stated, not guessed.
    """
    from pyspark.sql.types import NumericType

    dt = df.schema[ts_col].dataType
    if isinstance(dt, NumericType):
        raise TypeError(
            f"{ts_col!r} is numeric ({dt.simpleString()}): epoch unit is "
            "ambiguous (cast('timestamp') would read it as SECONDS; this "
            "repo's TIME_COL convention is MILLISECONDS). Convert "
            "explicitly first, e.g. F.timestamp_millis(ts) or "
            "F.timestamp_micros(ts)."
        )
    # cast is a no-op for TIMESTAMP and makes TIMESTAMP_NTZ sources
    # (bare parquet reads) resolve under unix_micros
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Strict-order funnel: a user reaches step ``i`` iff events of
    types ``steps[0..i]`` occur in strictly increasing timestamp order
    — and, when ``within_ms`` is given, all within that conversion
    window of the step-1 event that anchors the sequence (the
    Amplitude/Mixpanel "conversion window" semantics: ANY step-1 event
    may anchor; a user converts if at least one anchor's window
    contains a full chain).  Output: one row per step with the number
    of users reaching it (monotone non-increasing).

    Unwindowed, the earliest valid completion is taken at every step —
    greedy is optimal (taking the earliest valid timestamp never
    forecloses a later step) and one O(events) fold suffices.
    Windowed, greedy-per-anchor is optimal for a FIXED anchor, so the
    expression tries every anchor: per-step sorted timestamp arrays,
    and for each anchor an unrolled earliest-next-within-window chain
    (null propagates through ``filter``/``array_min``, so a broken
    chain scores where it broke).  Per-user cost is
    O(|anchors| * events) — funnel events only; for adversarial
    per-user skew pre-dedupe (user, step, ts) or use the oracle's
    k-aggregate join cascade.

    Events of types outside ``steps`` never leave the scan, and
    simultaneous-timestamp events tie-break by step order (the earlier
    step consumes the instant; the later step needs a strictly greater
    timestamp — the same convention as the oracle's ``ts > t_prev``
    join cascade).
    """
    if len(steps) == 0:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    idx = F.create_map(
        *[F.lit(x) for i, s in enumerate(steps) for x in (s, i)]
    )
    ev = (
        df.filter(F.col(event_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("_u"),
            _ts_micros(df, ts_col).alias("_t"),
            idx[F.col(event_col)].alias("_s"),
        )
    )
    if within_ms is None:
        # per user: fold the (ts, step)-sorted funnel events through the
        # reached/last-time recurrence — struct sort orders by ts first,
        # then step index (the tie-break documented above)
        per_user = ev.groupBy("_u").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("_t", "_s"))),
                F.struct(
                    F.lit(0).alias("reached"),
                    F.lit(None).cast("long").alias("last"),
                ),
                lambda acc, e: F.when(
                    (e["_s"] == acc["reached"])
                    & (acc["last"].isNull() | (e["_t"] > acc["last"])),
                    F.struct(
                        (acc["reached"] + F.lit(1)).alias("reached"),
                        e["_t"].alias("last"),
                    ),
                ).otherwise(acc),
            )["reached"].alias("_reached")
        )
    else:
        w_us = int(within_ms) * 1000
        arrs = [
            F.array_sort(
                F.collect_list(F.when(F.col("_s") == i, F.col("_t")))
            ).alias(f"_a{i}")
            for i in range(len(steps))
        ]
        per_user = ev.groupBy("_u").agg(*arrs)

        def _after(prev, t1):
            # one-arg lambda via a binding factory: a default-arg capture
            # (lambda x, p=prev) would change the HOF's ARITY and make
            # Spark pass the element INDEX as p
            return lambda x: (x > prev) & (x <= t1 + F.lit(w_us))

        def _chain_reach(t1):
            # unrolled earliest-next-within-window chain from anchor t1;
            # a null prev empties every later filter, so array_min stays
            # null past the break
            prev = t1
            reach = F.lit(1)
            for i in range(1, len(steps)):
                prev = F.array_min(F.filter(F.col(f"_a{i}"), _after(prev, t1)))
                reach = reach + F.when(prev.isNotNull(), 1).otherwise(0)
            return reach

        per_user = per_user.select(
            "_u",
            F.coalesce(
                F.aggregate(
                    F.col("_a0"),
                    F.lit(0),
                    lambda best, t1: F.greatest(best, _chain_reach(t1)),
                ),
                F.lit(0),
            ).alias("_reached"),
        )
    counts = per_user.agg(
        *[
            F.sum(F.when(F.col("_reached") >= i + 1, 1).otherwise(0))
            .cast("long")
            .alias(f"_c{i}")
            for i in range(len(steps))
        ]
    )
    # unpivot via an exploded struct array — never a SQL string, so a
    # quote (or anything else) in an event-type name can't break parsing
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"_c{i}").alias("users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("_r"))
        .select("_r.step", "_r.event_type", "_r.users")
        .orderBy("step")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active
    period (the cohort), counted in every period they return —
    ``(cohort, offset_periods, users)`` with offset 0 = the cohort
    period itself (so offset-0 users = cohort size).

    One full shuffle: per-user ``collect_set`` of active periods (set
    size bounded by the calendar, not the data), cohort =
    ``array_min``, explode, count.  ``period``: "week" or "day"
    (date_trunc units — weeks start Monday in both Spark and DuckDB).
    """
    days = {"week": 7, "day": 1}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}")
    per_user = (
        df.select(
            F.col(user_col).alias("_u"),
            F.date_trunc(period, F.col(ts_col)).cast("date").alias("_w"),
        )
        .groupBy("_u")
        .agg(F.collect_set("_w").alias("_ws"))
        .select(F.array_min("_ws").alias("cohort"), F.explode("_ws").alias("_w"))
    )
    return (
        per_user.select(
            "cohort",
            (F.datediff(F.col("_w"), F.col("cohort")) / days[period])
            .cast("int")
            .alias("offset_periods"),
        )
        .groupBy("cohort", "offset_periods")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("cohort", "offset_periods")
    )


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    gap_ms: int | None = None,
    include_entry: bool = True,
) -> DataFrame:
    """Event-flow transition matrix: how often event B directly follows
    event A for the same user — the user-flow / Sankey primitive next
    to :func:`funnel_counts`'s fixed sequences.  ``gap_ms`` breaks
    flows at inactivity gaps STRICTLY longer than it (the sessionize
    convention); ``include_entry`` adds the per-flow entry transitions
    from the synthetic ``__start__`` state, so entry-point counts fall
    out of the same matrix.

    Simultaneous timestamps tie-break by event name (deterministic,
    partition-independent).  One window pass over (user)-partitioned
    events + one count-shaped aggregate over (src, dst) pairs — the
    result is at most |event types|^2 (+ entries) rows regardless of
    data size.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, event_col)
    prev_ev = F.lag(event_col).over(w)
    gap_us = None if gap_ms is None else int(gap_ms) * 1000
    new_flow = prev_ev.isNull()
    if gap_us is not None:
        tmu = _ts_micros(df, ts_col)  # dtype-checked: numeric ts rejected
        new_flow = new_flow | (tmu - F.lag(tmu).over(w) > gap_us)
    src = F.when(new_flow, F.lit("__start__")).otherwise(prev_ev)
    d = df.select(
        src.alias("src"), F.col(event_col).alias("dst")
    )
    if not include_entry:
        d = d.filter(F.col("src") != "__start__")
    return (
        d.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src", "dst")
    )


def funnel_conversion_times(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Time-to-convert per converted user: the EARLIEST full-chain
    duration (last step ts − anchor ts, µs) over all step-1 anchors —
    the funnel's natural companion metric ("how long does view →
    purchase take?").  Same anchored greedy chains as
    :func:`funnel_counts` (greedy per anchor is optimal, so the min
    over anchors is the true earliest conversion); users who never
    complete the chain produce no row.  Output: (user, duration_us).
    """
    if len(steps) < 2:
        raise ValueError("conversion time needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    idx = F.create_map(
        *[F.lit(x) for i, s in enumerate(steps) for x in (s, i)]
    )
    ev = (
        df.filter(F.col(event_col).isin(list(steps)))
        .select(
            F.col(user_col).alias("_u"),
            _ts_micros(df, ts_col).alias("_t"),
            idx[F.col(event_col)].alias("_s"),
        )
    )
    w_us = None if within_ms is None else int(within_ms) * 1000
    arrs = [
        F.array_sort(
            F.collect_list(F.when(F.col("_s") == i, F.col("_t")))
        ).alias(f"_a{i}")
        for i in range(len(steps))
    ]
    per_user = ev.groupBy("_u").agg(*arrs)

    def _after(prev, t1):
        if w_us is None:
            return lambda x: x > prev
        return lambda x: (x > prev) & (x <= t1 + F.lit(w_us))

    def _chain_end(t1):
        prev = t1
        for i in range(1, len(steps)):
            prev = F.array_min(F.filter(F.col(f"_a{i}"), _after(prev, t1)))
        return prev  # null if the chain broke anywhere

    durations = F.filter(
        F.transform(F.col("_a0"), lambda t1: _chain_end(t1) - t1),
        lambda d: d.isNotNull(),
    )
    return (
        per_user.select(
            F.col("_u").alias(user_col),
            F.array_min(durations).alias("duration_us"),
        )
        .filter(F.col("duration_us").isNotNull())
    )
