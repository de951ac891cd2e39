"""Join operators — inner/outer/semi/anti/broadcast/interval.

Not present in the reference (single-table engine); part of the declared
relational extension (SURVEY.md §2.2 "Joins").

Scale notes (the part Catalyst can't decide for us):

- **Broadcast the small side explicitly** when we *know* it's a dimension
  table (region: 5 rows, nation: 25).  AQE would usually figure it out from
  runtime stats, but an explicit ``broadcast()`` hint removes the planning
  risk at 100 TB where a mis-planned shuffle join on a fact table is
  catastrophic.
- **Interval/as-of self-joins must carry an equality key.**  A pure range
  condition plans as a broadcast-nested-loop / cartesian; with an equi key
  (``user_id``) Spark plans a shuffled hash / sort-merge join on the key and
  evaluates the range as a post-join filter — per-key work, linear shuffle.
  Skewed keys are handled by AQE skew-join splitting (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    cond=None,
    how: str = "inner",
) -> DataFrame:
    """Equi join with explicit join type: inner/left/right/full/left_semi/
    left_anti.  Thin wrapper — Catalyst picks sort-merge vs shuffled-hash vs
    broadcast from stats + AQE."""
    return left.join(right, on if on is not None else cond, how)


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join with the dimension side broadcast — no shuffle of the fact table.
    Use for small dims (≤ the broadcast threshold, 64 MB in session.py)."""
    return fact.join(F.broadcast(dim), on, how)


def fact_fact_join(
    left: DataFrame,
    right: DataFrame,
    on=None,
    cond=None,
    how: str = "inner",
) -> DataFrame:
    """Join two FACT-scale relations with an explicit shuffle-hash hint.

    Why this exists: Catalyst's broadcast decision uses the *estimated*
    post-pruning scan size, and a few pruned columns of a fact table can
    estimate under the broadcast threshold — at which point the planner
    happily broadcasts millions of fact rows (observed: a 6M-row lineitem
    broadcast at sf1, 10x the query's runtime; at cluster scale it's an
    OOM).  When the caller KNOWS both sides scale with the data, the
    correct plan is a shuffled join on the key, full stop — the hint makes
    mis-estimation impossible instead of tuning thresholds around it.
    Shuffle-hash (not merge): co-partitioned build beats sorting both
    sides when neither input is pre-sorted on the key; AQE may still
    elect sort-merge if a side spills."""
    return left.hint("shuffle_hash").join(right, on if on is not None else cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    right_value_col: str,
    alias: str = "asof_val",
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` direction semantics: for
    each left row, the value of the matched right row with the same
    ``key`` (NULL when none) — the time-series join Spark lacks as a
    built-in (SURVEY.md §2.2 "Joins": as-of via window over unioned
    keys).

    ``direction``: ``"backward"`` (default) matches the latest right row
    with ``right.ts <= left.ts``; ``"forward"`` the earliest with
    ``right.ts >= left.ts``; ``"nearest"`` whichever of the two is
    closer in time, ties to backward (pandas resolves nearest-ties to
    the prior row).  ``tolerance`` NULLs any match farther than the
    tolerance — late-joining reference data past its validity window;
    its unit is ``ts_col``'s own unit for numeric ts columns and
    MICROSECONDS for timestamp columns (distances are computed on
    ``unix_micros``).

    Implementation: union-tag-window.  Tag right rows 0 / left rows 1,
    sort within each key by (ts, tag) — right-before-left on ties makes
    the join inclusive — and carry the *matched right row* with
    ``last(ignorenulls)`` over an unbounded-preceding frame (the
    forward carry is the same frame over the DESCENDING sort), then
    keep the left rows.  The carried payload is a struct holding both
    the value and the matched ts (non-null for every right row, null
    for left rows), so a matched right row whose VALUE is NULL still
    wins the carry and the join returns that NULL — matching DuckDB
    ASOF semantics — instead of skipping back to an older non-null
    value (round-3 advisor finding).

    Scale notes: ONE shuffle on ``key`` (the window partition), no join
    node at all — this beats the naive per-left-row range join (which
    explodes to per-key cross products) and is the classic distributed
    as-of plan; ``nearest`` re-sorts the same partitioning for the
    second carry but never re-shuffles.  Right rows should be unique
    per (key, ts); pre-aggregate if not.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction {direction!r}")
    vtype = dict(right.dtypes)[right_value_col]
    ttype = dict(right.dtypes)[ts_col]
    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(f"struct<v:{vtype},t:{ttype}>")
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts_col),
        F.struct(
            F.col(right_value_col).alias("v"), F.col(ts_col).alias("t")
        ).alias("_r"),
    ).withColumn("_is_left", F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    from pyspark.sql import Window

    def _carry(desc: bool):
        order = F.col(ts_col).desc() if desc else F.col(ts_col).asc()
        w = (
            Window.partitionBy(key)
            .orderBy(order, F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_r", ignorenulls=True).over(w)

    def _num(c):
        # numeric time axis for distance arithmetic (intervals from raw
        # timestamp subtraction don't support abs/threshold comparison)
        return F.unix_micros(c) if ttype.startswith("timestamp") else c

    if direction == "backward":
        m = _carry(desc=False)
    elif direction == "forward":
        m = _carry(desc=True)
    else:
        b, f = _carry(desc=False), _carry(desc=True)
        bd = _num(F.col(ts_col)) - _num(b["t"])
        fd = _num(f["t"]) - _num(F.col(ts_col))
        m = F.when(b.isNull(), f).when(f.isNull(), b).otherwise(
            F.when(bd <= fd, b).otherwise(f)  # ties to backward
        )
    out = u.withColumn("_m", m)
    if tolerance is not None:
        dist = F.abs(_num(F.col(ts_col)) - _num(F.col("_m")["t"]))
        out = out.withColumn(
            "_m", F.when(dist <= tolerance, F.col("_m"))
        )
    return (
        out.withColumn(alias, F.col("_m")["v"])
        .filter(F.col("_is_left") == 1)
        .drop("_is_left", "_r", "_m")
    )


def _interval_micros(interval_expr: str) -> int | None:
    """Width of a literal ``INTERVAL <n> <unit>`` in microseconds, or None
    when the expression isn't a simple literal (caller falls back to the
    unbucketed plan)."""
    import re

    m = re.fullmatch(
        r"\s*INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?\s*",
        interval_expr,
        re.IGNORECASE,
    )
    if not m:
        return None
    mult = {
        "SECOND": 1_000_000,
        "MINUTE": 60_000_000,
        "HOUR": 3_600_000_000,
        "DAY": 86_400_000_000,
    }[m.group(2).upper()]
    return int(m.group(1)) * mult


def interval_self_join(
    df: DataFrame,
    key: str,
    ts_col: str,
    interval_expr: str,
    left_alias: str = "e1",
    right_alias: str = "e2",
) -> DataFrame:
    """Pairs (a, b) with the same ``key`` and ``b.ts ∈ (a.ts, a.ts + interval]``.

    Written as equi-join on ``key`` + range predicates, never a cartesian:
    the equi key is what keeps the plan a hash/sort-merge join (see module
    docstring).  ``interval_expr`` e.g. ``"INTERVAL 5 MINUTES"``.
    """
    range_pred = lambda: (  # noqa: E731 — built twice against fresh aliases
        (F.col(f"{right_alias}.{ts_col}") > F.col(f"{left_alias}.{ts_col}"))
        & (
            F.col(f"{right_alias}.{ts_col}")
            <= F.expr(f"{left_alias}.{ts_col} + {interval_expr}")
        )
    )
    width_us = _interval_micros(interval_expr)
    if width_us is not None and dict(df.dtypes).get(ts_col, "").startswith(
        "timestamp"
    ):
        # Bucketed candidate generation — the distributed range join.
        # With only the key as equi condition, every key's rows cross-
        # product before the range filter: a key with n rows costs n² —
        # quadratic in per-key density, the true 100x-scale killer here
        # (measured 15.7 s at sf10 vs 1.3 s for DuckDB's IEJoin).  Bucket
        # time by the interval width W: b.ts ∈ (a.ts, a.ts+W] implies
        # bucket(b) ∈ {bucket(a), bucket(a)+1}, so exploding the left side
        # into its two candidate buckets and equi-joining on (key, bucket)
        # bounds each hash group to two adjacent W-windows — near-linear
        # in output size, and the explode is a map-side 2x, not a shuffle.
        bkt = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(width_us))
        a = (
            df.withColumn("_cand", F.explode(F.array(bkt, bkt + 1)))
            .alias(left_alias)
        )
        # hint the UN-exploded side: shuffle-hash build on the smaller input
        b = df.withColumn("_cand", bkt).hint("shuffle_hash").alias(right_alias)
        cond = (
            (F.col(f"{left_alias}.{key}") == F.col(f"{right_alias}.{key}"))
            & (F.col(f"{left_alias}._cand") == F.col(f"{right_alias}._cand"))
            & range_pred()
        )
        return (
            a.join(b, cond, "inner")
            .drop(F.col(f"{left_alias}._cand"))
            .drop(F.col(f"{right_alias}._cand"))
        )
    # non-literal interval: fall back to the key-only equi join
    a = df.alias(left_alias)
    b = df.alias(right_alias)
    cond = (
        F.col(f"{left_alias}.{key}") == F.col(f"{right_alias}.{key}")
    ) & range_pred()
    # both sides are the same fact-scale table: hint the shuffle join so a
    # pruned-size mis-estimate can never broadcast it (see fact_fact_join)
    return a.hint("shuffle_hash").join(b, cond, "inner")
