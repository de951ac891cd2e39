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
