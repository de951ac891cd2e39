"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for state machines the built-in windowed aggregations
can't express (SURVEY.md §2.2 "Streaming"; §7.3 reserves this for
PromQL-style staleness handling).

``running_totals`` is the reference pattern: per-key state (count, sum,
last event time) carried across micro-batches, updated from Arrow-batched
pandas frames, emitted per batch.  State lives in the state store
(checkpointed, partitioned by key) — memory is bounded per key, and a
processing-time timeout evicts idle keys (the staleness marker Prometheus
applies after 5 minutes without a sample).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # idle key evicted: emit a final tombstone-free snapshot and drop
        (n, sv) = state.get
        state.remove()
        yield pd.DataFrame({"key": [key[0]], "n": [n], "sv": [sv]})
        return
    n, sv = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        sv += float(pdf["value"].sum())
    state.update((n, sv))
    state.setTimeoutDuration(5 * 60 * 1000)  # staleness horizon: 5 min idle
    yield pd.DataFrame({"key": [key[0]], "n": [n], "sv": [sv]})


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key running (count, sum) with idle-key eviction.

    Scale: state is partitioned by key across executors (one shuffle per
    micro-batch on the key), each key's state is two scalars, and the
    timeout bounds the keyspace to recently-active keys — the same
    state-size discipline watermarks give windowed aggs.
    """
    sel = events.select(
        events[key_col].alias("key"), events[value_col].alias("value")
    )
    return sel.groupBy("key").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# streaming counter rate: the TSDB-domain stateful operator

_RATE_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_samples", LongType()),
        StructField("first_time", LongType()),
        StructField("last_time", LongType()),
        StructField("increase", DoubleType()),
        StructField("rate", DoubleType()),
    ]
)

_RATE_STATE = StructType(
    [
        StructField("first_time", LongType()),
        StructField("last_time", LongType()),
        StructField("last_value", DoubleType()),
        StructField("increase", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _update_rate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.hasTimedOut:
        ft, lt, lv, inc, n = state.get
        state.remove()  # staleness eviction: emit the final snapshot
        span = (lt - ft) / 1000.0
        yield pd.DataFrame(
            {"key": [key[0]], "n_samples": [n], "first_time": [ft],
             "last_time": [lt], "increase": [inc],
             "rate": [inc / span if span > 0 else None]}
        )
        return

    ft, lt, lv, inc, n = state.get if state.exists else (0, 0, 0.0, 0.0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values("time")
        ts = batch["time"].to_numpy()
        vs = batch["value"].to_numpy(dtype="float64")
        if n > 0:
            # late samples from before the carried state are DROPPED — a
            # counter delta against them is meaningless; upstream
            # ordering comes from the sorted source + watermark
            keep = ts > lt
            ts, vs = ts[keep], vs[keep]
        if len(ts):
            if n > 0:
                vfull = np.concatenate(([lv], vs))
            else:
                vfull = vs
                ft = int(ts[0])
            dv = np.diff(vfull)
            # Prometheus reset rule: a decrease restarts from 0, so the
            # sample's own value is the post-reset contribution
            inc += float(np.where(dv >= 0, dv, vfull[1:]).sum())
            lt, lv = int(ts[-1]), float(vs[-1])
            n += len(ts)
    state.update((ft, lt, lv, inc, n))
    state.setTimeoutDuration(5 * 60 * 1000)
    span = (lt - ft) / 1000.0
    yield pd.DataFrame(
        {"key": [key[0]], "n_samples": [n], "first_time": [ft],
         "last_time": [lt], "increase": [inc],
         "rate": [inc / span if span > 0 else None]}
    )


def streaming_counter_rate(
    samples: DataFrame,
    key_col: str = "series_key",
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Streaming PromQL-style counter increase/rate per series — the
    reset-aware sequential recurrence (timeseries.counter_rate's batch
    semantics) carried across micro-batches in keyed state.

    This is the operator class SURVEY.md §7.3 reserves for
    ``applyInPandasWithState``: each series needs its previous sample to
    interpret the next one, which windowed aggregations cannot express.
    State per key is five scalars; the 5-minute processing-time timeout
    is the Prometheus staleness rule as state eviction — the keyspace
    stays bounded to live series.  After the final micro-batch the
    cumulative ``increase``/``rate`` equal the batch ``counter_rate`` on
    the same data (tested via availableNow replay).
    """
    sel = samples.select(
        samples[key_col].alias("key"),
        samples[time_col].alias("time"),
        samples[value_col].alias("value"),
    )
    return sel.groupBy("key").applyInPandasWithState(
        _update_rate,
        outputStructType=_RATE_OUTPUT,
        stateStructType=_RATE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
