"""Interval-union analytics: islands, coverage, and heartbeat uptime.

The gaps-and-islands family (TimescaleDB ``heartbeat_agg`` /
``state_agg`` territory, SQL-pattern canon since Itzik Ben-Gan): merge
a key's overlapping-or-touching intervals into maximal disjoint
"islands", then derive covered time (uptime), gap time, and island
counts.  Complements :mod:`.prefix`'s ``interval_concurrency`` (point-
in-time overlap COUNT) with the union/measure view of the same data.

The merge rule is the running-maximum identity: sort a key's intervals
by start, and an interval starts a NEW island iff its start exceeds the
maximum end seen so far (plus ``bridge_gap``).  ``max(end) OVER (rows
unbounded preceding TO 1 preceding)`` + a running count of new-island
flags labels every row with its island id — two window functions over
ONE exchange on the key, and the per-island aggregate reuses that
partitioning (grouping keys are a superset of the window partition
keys, so Spark's subset co-partitioning adds no second shuffle).

100 TB shape: one key-partitioned exchange, window state is a single
running max — no self-join, no unbounded collect.  Skewed keys (one
entity with millions of intervals) serialize that key's window; salt by
coarse time range and merge islands at salt boundaries if a single key
dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_islands(
    df: DataFrame,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bridge_gap: int = 0,
) -> DataFrame:
    """Merge each key's overlapping-or-touching ``[start, end)``
    intervals into maximal disjoint islands.

    Touching intervals (next start == current max end) merge; a gap
    STRICTLY greater than ``bridge_gap`` (same unit as the bounds, 0 =
    only true overlap/touch merges) splits.  Output: one row per island
    with ``island_start``, ``island_end``, ``n_intervals`` — start/end
    keep the input column dtype semantics (numeric epochs stay numeric).

    Zero-length and inverted intervals count toward ``n_intervals`` of
    whatever island contains their start (end < start never EXTENDS an
    island — the running max ignores it).
    """
    keys = keys or []
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + F.lit(bridge_gap)),
        1,
    ).otherwise(0)
    d = df.withColumn("_iv_new", new_island).withColumn(
        "_iv_island", F.sum("_iv_new").over(w)
    )
    return (
        d.groupBy(*keys, "_iv_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_iv_island")
    )


def interval_coverage(
    df: DataFrame,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bridge_gap: int = 0,
) -> DataFrame:
    """Total covered measure and island/gap statistics per key: the
    sum of island lengths (union measure — overlap never double-counts),
    the number of islands, and the total internal gap time
    (span − covered).  One exchange end-to-end (islands + this rollup
    share the key partitioning)."""
    keys = keys or []
    isl = interval_islands(df, start_col, end_col, keys, bridge_gap)
    return isl.groupBy(*keys).agg(
        F.sum(
            F.col("island_end").cast("long")
            - F.col("island_start").cast("long")
        ).alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
        (
            F.max(F.col("island_end").cast("long"))
            - F.min(F.col("island_start").cast("long"))
            - F.sum(
                F.col("island_end").cast("long")
                - F.col("island_start").cast("long")
            )
        ).alias("gap_time"),
        F.sum("n_intervals").alias("n_intervals"),
    )


def heartbeat_uptime(
    df: DataFrame,
    time_col: str,
    liveness: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Uptime from heartbeats (TimescaleDB ``heartbeat_agg`` parity):
    each heartbeat at ``t`` asserts liveness over ``[t, t + liveness)``;
    uptime per key is the union measure of those intervals — two
    heartbeats closer than ``liveness`` never double-count, a gap
    longer than ``liveness`` is downtime.  ``liveness`` is in the time
    column's own unit.  Same single-exchange shape as
    :func:`interval_coverage`."""
    d = df.select(
        *(keys or []),
        F.col(time_col).alias("_hb_s"),
        (F.col(time_col) + F.lit(liveness)).alias("_hb_e"),
    )
    return interval_coverage(d, "_hb_s", "_hb_e", keys)


def state_agg(
    df: DataFrame,
    state_col: str,
    time_col: str,
    keys: list[str] | None = None,
    end_time: int | None = None,
) -> DataFrame:
    """Time-in-state per key (TimescaleDB ``state_agg``/``state_timeline``
    parity): state-change events carry the state that HOLDS from their
    timestamp until the next event; this rolls up total duration and
    visit count per (key, state).

    The last event of each key holds until ``end_time`` when given
    (observation end), else contributes only to ``n_visits`` (an
    open-ended duration is not invented).  Repeated events with the
    SAME state still count as visits but merge into one held span —
    duration attributes to the state either way, so re-asserting a
    state never splits or double-counts time.

    One key exchange: the lead() window and the (key, state) aggregate
    share the key partitioning (subset co-partitioning — the same
    single-shuffle shape as :func:`interval_islands`).
    """
    keys = keys or []
    w = Window.partitionBy(*keys).orderBy(time_col, state_col)
    nxt = F.lead(time_col).over(w)
    until = F.coalesce(nxt, F.lit(end_time)) if end_time is not None else nxt
    d = df.withColumn(
        "_sa_dur",
        (until.cast("long") - F.col(time_col).cast("long")),
    )
    return (
        d.groupBy(*keys, F.col(state_col).alias("state"))
        .agg(
            F.sum("_sa_dur").alias("duration"),
            F.count(F.lit(1)).alias("n_visits"),
        )
    )


def interval_gaps(
    df: DataFrame,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bridge_gap: int = 0,
) -> DataFrame:
    """The DOWNTIME report — the complement of :func:`interval_islands`:
    one row per internal gap between a key's consecutive islands, with
    ``gap_start`` (the earlier island's end), ``gap_end`` (the next
    island's start) and ``gap_len``.  Keys with one island emit nothing
    (no internal gaps; lead-in/lead-out are observation-window policy,
    not data).  Adds one lead() window over the ISLAND rows — island
    counts, not raw rows — reusing the key partitioning."""
    keys = keys or []
    isl = interval_islands(df, start_col, end_col, keys, bridge_gap)
    w = Window.partitionBy(*keys).orderBy("island_start")
    nxt = F.lead("island_start").over(w)
    return (
        isl.withColumn("_gap_end", nxt)
        .filter(F.col("_gap_end").isNotNull())
        .select(
            *keys,
            F.col("island_end").alias("gap_start"),
            F.col("_gap_end").alias("gap_end"),
            (F.col("_gap_end").cast("long")
             - F.col("island_end").cast("long")).alias("gap_len"),
        )
    )
