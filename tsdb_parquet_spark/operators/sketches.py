"""Approximate distinct-set algebra with Theta sketches (DataSketches,
built into Spark 4.1 as ``theta_*`` expressions).

HLL (rollup.py) answers "how many distinct" for ONE set; Theta sketches
additionally support **intersection and difference**, which makes the
retention / churn / overlap family of questions answerable from tiny
mergeable state instead of exact distinct joins:

- retention: ``|users(day1) ∩ users(day2)|``
- churn:     ``|users(day1) \\ users(day2)|``
- overlap of two corpora's vocabularies, shared IPs across services, ...

At 100 TB the exact forms are among the most expensive queries there are
(COUNT DISTINCT over a join of two fact scans — two full shuffles of raw
keys); the sketch forms aggregate each side to KB-sized state (map-side
partials, one state row per group) and combine driver-free.  Sketches are
mergeable, so they also persist as incremental state (same pattern as
``rollup.rollup_state``).

Not in the reference (no aggregates at all — SURVEY §2.1 R17 collects
samples); this is the north-star "novel sketch" extension slot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theta_state(df: DataFrame, keys: list[str], col: str,
                alias: str = "sketch") -> DataFrame:
    """Per-group Theta sketch over ``col`` — one hash aggregate, shuffle
    carries one sketch per (task, group)."""
    return df.groupBy(*keys).agg(F.theta_sketch_agg(col).alias(alias))


def theta_set_compare(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    col: str,
) -> DataFrame:
    """Per-key approximate set algebra between two sides: distinct counts
    of each side, their union, intersection, and both differences.

    ``a``/``b`` are row-level inputs (e.g. yesterday's and today's
    events); each side is sketched per key, the two state tables join on
    the keys (outer — a key present on one side only still reports), and
    the estimates are pure expressions over the two sketches.  Keys
    missing a side use an empty sketch so set semantics stay correct
    (∩ = 0, \\ = full other side).
    """
    sa = theta_state(a, keys, col, "sk_a")
    sb = theta_state(b, keys, col, "sk_b")
    j = sa.join(sb, keys, "full_outer")
    # theta_union/intersection need non-null inputs; a side missing a key
    # contributes the empty set via the when() branches below
    ska = F.col("sk_a")
    skb = F.col("sk_b")
    est = F.theta_sketch_estimate
    return j.select(
        *keys,
        F.round(F.when(ska.isNull(), F.lit(0.0)).otherwise(est(ska))).cast("long").alias("n_a"),
        F.round(F.when(skb.isNull(), F.lit(0.0)).otherwise(est(skb))).cast("long").alias("n_b"),
        F.round(
            F.when(ska.isNull(), est(skb))
            .when(skb.isNull(), est(ska))
            .otherwise(est(F.theta_union(ska, skb)))
        ).cast("long").alias("n_union"),
        F.round(
            F.when(ska.isNull() | skb.isNull(), F.lit(0.0))
            .otherwise(est(F.theta_intersection(ska, skb)))
        ).cast("long").alias("n_intersect"),
        F.round(
            F.when(ska.isNull(), F.lit(0.0))
            .when(skb.isNull(), est(ska))
            .otherwise(est(F.theta_difference(ska, skb)))
        ).cast("long").alias("n_a_only"),
        F.round(
            F.when(skb.isNull(), F.lit(0.0))
            .when(ska.isNull(), est(skb))
            .otherwise(est(F.theta_difference(skb, ska)))
        ).cast("long").alias("n_b_only"),
    )


def retention(
    events: DataFrame,
    period_col,
    p1,
    p2,
    user_col: str = "user_id",
    keys: list[str] | None = None,
) -> DataFrame:
    """Cohort retention between two periods: per optional extra ``keys``,
    how many distinct users were active in ``p1``, in ``p2``, in both
    (retained), and only in ``p1`` (churned)."""
    keys = keys or []
    pc = F.col(period_col) if isinstance(period_col, str) else period_col
    a = events.filter(pc == p1)
    b = events.filter(pc == p2)
    if not keys:
        a = a.withColumn("_all", F.lit(1))
        b = b.withColumn("_all", F.lit(1))
        out = theta_set_compare(a, b, ["_all"], user_col).drop("_all")
    else:
        out = theta_set_compare(a, b, keys, user_col)
    return out.withColumnRenamed("n_intersect", "retained").withColumnRenamed(
        "n_a_only", "churned"
    )
