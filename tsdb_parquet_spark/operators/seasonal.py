"""Seasonal baseline + residual anomaly detection: learn the periodic
profile of a metric (mean/stddev per season slot per key) and flag the
samples that sit far outside it — the ops-dashboard "is this hour's
traffic normal FOR this hour" question, which an unsegmented global
z-score (q73's MAD family) answers wrongly whenever load has a daily
or weekly shape.

Exactness discipline: the per-slot moments come from EXACT decimal power
sums (sum v, sum v^2 at fixed scales — the q109 moment machinery), so
mean and variance are bit-identical across engines; the z-score is then
a deterministic double expression rounded at the edge.

100 TB shape: ONE hash aggregate over (keys, slot) builds the baseline
(output rows = |keys| x |slots|, tiny by construction) which BROADCASTS
back onto the raw stream for the residual pass — no second full-data
shuffle, no window.  At 100 TB the baseline build is the only exchange
and it is a partial-combine aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_baseline(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    slot: str = "hour",
) -> DataFrame:
    """Per (keys, slot-of-period) exact moments: n, mean, stddev(pop).

    ``slot``: "hour" (hour-of-day 0-23) or "dow_hour" (day-of-week x
    hour, 168 weekly slots).  Variance uses the exact power sums:
    var = sumsq/n - (sum/n)^2, population form — deterministic given
    the decimal-exact sums.
    """
    if slot == "hour":
        slot_col = F.hour(ts_col)
    elif slot == "dow_hour":
        slot_col = (F.dayofweek(ts_col) - 1) * 24 + F.hour(ts_col)
    else:
        raise ValueError(f"unknown slot {slot!r}")
    v = F.col(value_col)
    base = (
        df.withColumn("slot", slot_col)
        .groupBy(*keys, "slot")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v.cast("decimal(28,6)")).alias("_s"),
            F.sum((v * v).cast("decimal(38,12)")).alias("_s2"),
        )
    )
    mean = (F.col("_s").cast("double") / F.col("n"))
    var = (F.col("_s2").cast("double") / F.col("n")) - mean * mean
    return base.select(
        *keys,
        "slot",
        "n",
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_std"),
    )


def seasonal_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: tuple[str, ...] = ("event_type",),
    slot: str = "hour",
    z_threshold: float = 3.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Rows whose value deviates from their own (keys, slot) baseline by
    more than ``z_threshold`` population standard deviations, with the
    rounded z-score.  Slots with zero variance cannot flag (a constant
    series has no outliers by this definition — division guarded)."""
    base = seasonal_baseline(df, ts_col, value_col, keys, slot)
    if slot == "hour":
        slot_col = F.hour(ts_col)
    else:
        slot_col = (F.dayofweek(ts_col) - 1) * 24 + F.hour(ts_col)
    joined = df.withColumn("slot", slot_col).join(
        F.broadcast(base), [*keys, "slot"]
    )
    z = (F.col(value_col) - F.col("_mean")) / F.col("_std")
    return (
        joined.filter(
            (F.col("_std") > 0) & (F.abs(z) > F.lit(float(z_threshold)))
        )
        .select(
            id_col,
            ts_col,
            *keys,
            value_col,
            F.round(z, 6).alias("zscore"),
        )
    )
