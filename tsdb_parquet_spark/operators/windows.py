"""Window-function operators — ranking, analytic frames, sessionization.

Not in the reference (SURVEY.md §2.2 "Window functions").  Spark windows
shuffle once on ``partitionBy`` and sort within partitions; there is no
cross-partition state, so they scale linearly in partition count.  The
skew risk is a single giant partition key — at 100 TB, sessionization by a
hot user is the classic case; AQE cannot split a window partition, so key
salting (bucket the key by a time prefix) is the mitigation when needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rn_alias: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ROW_NUMBER ≤ k.  ``order_by`` must end with a
    unique tiebreaker for determinism (convention D1)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rn_alias, F.row_number().over(w).cast("int"))
        .filter(F.col(rn_alias) <= k)
    )


def lag_moving_avg(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    lag_col: str,
    avg_col: str,
    preceding: int = 2,
    round_dp: int = 4,
    lag_alias: str = "prev_id",
    avg_alias: str = "mavg",
) -> DataFrame:
    """LAG + moving average over a ROWS frame — the analytic-window shape
    (Q19).  Frame is ``ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW``.
    Both functions share one window partitioning → a single exchange."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    wf = w.rowsBetween(-preceding, Window.currentRow)
    return df.withColumn(lag_alias, F.lag(lag_col).over(w)).withColumn(
        avg_alias, F.round(F.avg(avg_col).over(wf), round_dp)
    )


def range_frame_sum(
    df: DataFrame,
    partition_by: list[str],
    range_col: Column,
    preceding: int,
    sum_col: str,
    alias: str = "range_sum",
    round_dp: int = 4,
) -> DataFrame:
    """Aggregate over a RANGE frame — value-based, not row-based: the frame
    is every row whose ``range_col`` lies within ``[current - preceding,
    current]``, e.g. a '10 minutes of event time' sliding sum.  One shuffle
    on the partition keys, sort within; same scale profile as any window."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(range_col)
        .rangeBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(alias, F.round(F.sum(sum_col).over(w), round_dp))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 1800,
    session_alias: str = "session_id",
    pin: bool = True,
) -> DataFrame:
    """Assign session ids by inactivity gap: a new session starts when the
    time since the previous event (per user) exceeds ``gap_seconds``.
    lag → new-session flag → running sum — standard batch sessionization
    (Q28's batch form; the streaming form is ``session_window``,
    streaming/windows.py).

    Both window passes share the same (partitionBy, orderBy), so Spark plans
    a single shuffle + sort on ``user_col`` — pinned against AQE
    byte-coalescing (operators/partitioning.pin_partitioning: the
    exchange carries full event rows and the sort happens after it).
    ``pin=False`` skips the explicit repartition — for small inputs that
    are already usefully partitioned, where a full-width exchange would
    cost more than it saves.
    """
    from .partitioning import pin_partitioning

    if pin:
        df = pin_partitioning(df, [user_col])
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # Full-precision epoch seconds (double keeps the µs fraction) so the gap
    # comparison is exact — second-truncation here would mis-bucket events
    # whose gap straddles the threshold by <1s.
    epoch = F.col(ts_col).cast("double")
    prev_epoch = F.lag(epoch).over(w)
    new_session = F.when(
        prev_epoch.isNull() | (epoch - prev_epoch > F.lit(float(gap_seconds))), 1
    ).otherwise(0)
    return df.withColumn("_new_session", new_session).withColumn(
        session_alias, F.sum("_new_session").over(w)
    ).drop("_new_session")


def session_cooccurrence(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Market-basket co-occurrence over inactivity sessions: for every
    unordered pair of event types that appear in the SAME session,
    the session count, support, and lift — the "what do users do
    together" association view (which behaviors cluster in a visit),
    built on :func:`sessionize`.

    Exactness: support and lift are ratios of INTEGER session counts
    (``lift = n_ab * N / (n_a * n_b)``, one rounded double division) —
    no float crosses an exchange.

    100 TB shape: sessionize's one user exchange; the (user, session)
    distinct-type collapse REUSES that partitioning (grouping on a
    superset of the partition keys — zero extra exchange under the
    subset-co-partition rule); per-session type sets are bounded by the
    type alphabet, so the HOF pair expansion is O(|types|^2) per
    session, never row^2; pair/single counts are alphabet-sized
    aggregates and the final lift join is a broadcast.  The session
    total is ONE driver int.
    """
    s = sessionize(df, user_col, ts_col, tiebreak_col, gap_seconds)
    # distinct sorted types per session; sort_array makes (a, b) with
    # a < b canonical without a second pass
    sess = s.groupBy(user_col, "session_id").agg(
        F.sort_array(F.collect_set(type_col)).alias("_types")
    )
    # persisted and shared by the count + singles + pairs passes; the
    # returned plan stays LAZY and composable (the r9 collect-and-
    # recreate round-trip hardcoded a string pair type and re-planned
    # from a local relation) — the ContextCleaner unpersists when the
    # plan is GC'd, and an evicted partition recomputes from lineage
    sess = sess.persist()
    n_sessions = sess.count()  # one driver int; also warms the cache
    singles = (
        sess.select(F.explode("_types").alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    # stage the array once (HOF staging rule, SCALE.md 5i), then
    # expand ordered pairs (i < j) inside one flatten(transform(...))
    pairs = sess.select(
        F.explode(
            F.flatten(
                F.transform(
                    "_types",
                    lambda x, i: F.transform(
                        F.slice(
                            "_types",
                            i + F.lit(2),
                            F.greatest(
                                F.size("_types") - i - 1, F.lit(0)
                            ),
                        ),
                        lambda y: F.struct(
                            x.alias("a"), y.alias("b")
                        ),
                    ),
                )
            )
        ).alias("_p")
    ).select("_p.a", "_p.b")
    pair_counts = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    sb = singles.select(
        F.col("a").alias("b"), F.col("n_a").alias("n_b")
    )
    return (
        pair_counts.join(F.broadcast(singles), "a")
        .join(F.broadcast(sb), "b")
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") / F.lit(float(n_sessions)), 6
            ).alias("support"),
            F.round(
                (F.col("n_ab") * F.lit(n_sessions)).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
