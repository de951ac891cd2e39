"""Continuous aggregate (hypertable rollup): incrementally-maintained
time-bucket rollups with mergeable partial-aggregate state.

``timeseries.downsample`` computes a rollup in one shot; this module makes
the rollup a *maintained table*: new samples arrive (batch appends or a
stream) and only the affected buckets are recomputed/merged — the
TimescaleDB continuous-aggregate / materialized-rollup pattern the
reference's end-goal stack (Thanos downsampling) applies at ingest time.
Not in the reference (no persistence at all — Parquet write disabled,
``/root/reference/hello.go:510``); this is the north-star extension's
materialized twin of R4/R5's sorted write path.

Scale design (the part that must survive 100 TB / 1000 executors):

- **Mergeable state, not finalized values.**  The stored rollup keeps
  per-(series, bucket) partial aggregates ``(n, sum_u, min_v, max_v,
  last_t, last_v)`` where ``sum_u`` is the scale-6 long-unit accumulator of
  ``operators.aggregates.decimal_sum`` — long + long is exact and
  order-independent, so *merging partials is associative*: state from any
  split of the input rows merges to bit-identical finalized output.  A
  micro-batch therefore aggregates ONLY its own rows (no re-read of the
  base table) and merges with stored state.
- **Partition-pruned rewrite.**  The rollup table is directory-partitioned
  by a coarse chunk of the bucket id (``chunk = bucket // buckets_per
  _chunk``).  A refresh touches only the chunk partitions its delta
  intersects — dynamic partition overwrite (``partitionOverwriteMode=
  dynamic``) leaves every other partition's files untouched, so refresh
  cost scales with the delta's time span, not the table's.
- **One shuffle per refresh.**  delta-state aggregation is a single hash
  agg (map-side partials); the merge is a second hash agg over (existing
  affected state ∪ delta state) — both shuffles carry one state row per
  (series, bucket), never raw samples.

The late-data story is structural: a sample landing in an old bucket simply
routes its state row to that bucket's chunk partition and merges — no
watermark needed for correctness in the batch path (the streaming wrapper
adds one only to bound *state held by Spark*, not the rollup's).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .timeseries import TIME_COL, VALUE_COL, label_columns

_UNIT = 10**6  # scale-6 long units, matching aggregates.exact_value_sum

STATE_COLS = [
    "n", "sum_u", "min_v", "max_v", "last_t", "last_v", "nd_sketch", "q_sketch",
]


class ConcurrentRefreshError(RuntimeError):
    """A second refresh attempted while another holds the rollup lock."""


class _refresh_lock:
    """Single-writer guard for a rollup table.

    ``refresh_rollup`` is read-merge-overwrite of the same path: two
    concurrent refreshes of one rollup (e.g. the CLI ``rollup-refresh``
    racing the streaming maintainer) would each read pre-merge state and
    the second overwrite would silently drop the first's delta.  The
    guard is an O_EXCL lock file beside the table — atomic on a local
    or NFS/HDFS-mounted POSIX path, which is where this engine's state
    tables live; on an object store substitute the table format's own
    commit protocol (Iceberg/Delta) instead.  Holds pid + ISO timestamp
    for post-crash triage; a crashed holder's lock must be removed by
    the operator (the error message names the path).
    """

    def __init__(self, rollup_path: str):
        self.lock_path = rollup_path.rstrip("/") + ".__refresh_lock"

    def __enter__(self):
        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            holder = ""
            try:
                with open(self.lock_path) as f:
                    holder = f.read().strip()
            except OSError:
                pass
            raise ConcurrentRefreshError(
                f"rollup refresh already in progress ({holder or 'unknown'}); "
                f"serialize refreshes of one rollup — if the holder crashed, "
                f"remove {self.lock_path}"
            ) from None
        import datetime

        os.write(
            fd,
            f"pid={os.getpid()} at={datetime.datetime.now(datetime.UTC).isoformat()}".encode(),
        )
        os.close(fd)
        return self

    def __exit__(self, *exc):
        try:
            os.remove(self.lock_path)
        except FileNotFoundError:
            pass
        return False


def rollup_state(
    df: DataFrame,
    step_ms: int,
    labels: list[str] | None = None,
    buckets_per_chunk: int = 24,
    distinct_col: str | None = None,
    quantiles: bool = False,
) -> DataFrame:
    """Per-(series, bucket) mergeable partial-aggregate state for ``df``'s
    samples — one hash aggregate, map-side partials, shuffle carries one
    state row per group.

    ``chunk`` is the directory-partition key (``bucket // buckets_per
    _chunk``): with 1 h buckets the default groups a UTC day per partition.

    ``distinct_col`` adds a **mergeable HLL sketch** (``nd_sketch``,
    Apache DataSketches via ``hll_sketch_agg``) so the rollup can answer
    per-bucket approximate COUNT DISTINCT (e.g. distinct users per hour)
    incrementally — exact distinct state would require keeping every key;
    the sketch is a few KB per bucket and unions losslessly (sketch-merge
    is associative, so incremental == one-shot *exactly*, not just within
    error bounds).

    ``quantiles=True`` adds a **mergeable KLL sketch** over the value
    column (``q_sketch``, ``kll_sketch_agg_double``): per-bucket p50/p95/
    p99 (any rank at read time) maintained incrementally — the downsample
    statistic exact percentiles can't give you without re-reading raw
    samples, and the reason holistic aggregates are usually missing from
    materialized rollups.  Same associativity property as HLL.
    """
    labels = labels if labels is not None else label_columns(df)
    bucket = (F.col(TIME_COL) / F.lit(step_ms)).cast("bigint")
    u = (F.col(VALUE_COL).cast("decimal(18,6)") * _UNIT).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(u).alias("sum_u"),
        F.min(VALUE_COL).alias("min_v"),
        F.max(VALUE_COL).alias("max_v"),
        F.max(TIME_COL).alias("last_t"),
        F.max_by(VALUE_COL, F.col(TIME_COL)).alias("last_v"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(distinct_col).alias("nd_sketch"))
    if quantiles:
        aggs.append(F.kll_sketch_agg_double(VALUE_COL).alias("q_sketch"))
    return (
        df.groupBy(*labels, bucket.alias("bucket"))
        .agg(*aggs)
        .withColumn(
            "chunk", (F.col("bucket") / F.lit(buckets_per_chunk)).cast("bigint")
        )
    )


def merge_rollup_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two state tables over the same keys.  Every combine is
    associative and order-independent (long +, min, max, argmax-by-time),
    so ``merge(state(x), state(y)) == state(x ∪ y)`` bit-for-bit."""
    keys = [c for c in a.columns if c not in STATE_COLS]
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_u").alias("sum_u"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.max("last_t").alias("last_t"),
        F.max_by("last_v", F.col("last_t")).alias("last_v"),
    ]
    if "nd_sketch" in a.columns:
        aggs.append(F.hll_union_agg("nd_sketch").alias("nd_sketch"))
    if "q_sketch" in a.columns:
        aggs.append(F.kll_merge_agg_double("q_sketch").alias("q_sketch"))
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def finalize_rollup(state: DataFrame) -> DataFrame:
    """State → the ``timeseries.downsample`` output shape (n, avg_v, min_v,
    max_v, last_v per (series, bucket)).  ``avg_v`` rebuilds the exact
    decimal sum from the long units with one decimal division, then
    divides by n — bit-identical to downsample's
    ``exact_value_sum(value)/count`` regardless of how the state was
    split and merged."""
    exact_sum = (F.col("sum_u").cast("decimal(38,6)") / F.lit(_UNIT)).cast(
        "double"
    )
    keys = [c for c in state.columns if c not in STATE_COLS and c != "chunk"]
    out = [
        *keys,
        F.col("n"),
        (exact_sum / F.col("n")).alias("avg_v"),
        F.col("min_v"),
        F.col("max_v"),
        F.col("last_v"),
    ]
    if "nd_sketch" in state.columns:
        out.append(F.hll_sketch_estimate("nd_sketch").alias("approx_nd"))
    if "q_sketch" in state.columns:
        for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            out.append(
                F.kll_sketch_get_quantile_double("q_sketch", F.lit(q)).alias(name)
            )
    return state.select(*out)


def refresh_rollup(
    spark: SparkSession,
    delta: DataFrame,
    rollup_path: str,
    step_ms: int,
    labels: list[str] | None = None,
    buckets_per_chunk: int = 24,
    distinct_col: str | None = None,
    quantiles: bool = False,
) -> None:
    """Incrementally fold ``delta`` (new/late samples, raw rows) into the
    materialized state table at ``rollup_path``.

    Plan shape: aggregate the delta to state (1 shuffle of state rows);
    read ONLY the chunk partitions the delta touches (partition pruning on
    the ``chunk`` directory key — asserted in tests via the input-file
    list); merge (1 more state-row shuffle); dynamic-partition-overwrite
    exactly those chunks.  Cost is O(delta + affected chunks), independent
    of total rollup size — the property that makes the rollup maintainable
    under continuous ingest at 100 TB.

    SINGLE WRITER per rollup path: refreshes are serialized by a lock
    file (see ``_refresh_lock``); a concurrent attempt raises
    :class:`ConcurrentRefreshError` instead of silently losing one
    delta's state.  Concurrent READERS are unaffected.
    """
    with _refresh_lock(rollup_path):
        delta_state = rollup_state(
            delta, step_ms, labels, buckets_per_chunk, distinct_col, quantiles
        )
        fresh = not os.path.exists(rollup_path)
        if not fresh:
            # the state table is re-used for the chunk list and the merge —
            # cache so the delta aggregates once (state rows only, small)
            delta_state = delta_state.persist()
        try:
            if fresh:
                out = delta_state
            else:
                chunks = [
                    r["chunk"]
                    for r in delta_state.select("chunk").distinct().collect()
                ]
                existing = spark.read.parquet(rollup_path).filter(
                    F.col("chunk").isin(chunks)
                )
                out = merge_rollup_state(existing, delta_state)
            (
                out.repartition("chunk")
                .sortWithinPartitions("bucket")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("chunk")
                .parquet(rollup_path)
            )
        finally:
            if not fresh:
                delta_state.unpersist()


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Finalized rollup view over the materialized state table."""
    return finalize_rollup(spark.read.parquet(rollup_path))


def streaming_rollup(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
    step_ms: int,
    labels: list[str] | None = None,
    buckets_per_chunk: int = 24,
    distinct_col: str | None = None,
    quantiles: bool = False,
    trigger_available_now: bool = False,
):
    """Continuous-aggregate maintenance as a stream: each micro-batch runs
    one incremental ``refresh_rollup``.  Spark holds NO aggregation state
    across batches — the rollup table itself is the state (mergeable
    partials), so arbitrarily late data stays correct without a watermark,
    and a restart resumes from the checkpointed source offsets with
    exactly-once-per-batch refresh semantics (dynamic partition overwrite
    is idempotent per batch replay only if the batch content is stable;
    file/kafka sources with checkpoints give exactly that).

    SINGLE WRITER: each micro-batch takes the rollup's refresh lock, so
    a CLI ``rollup-refresh`` racing this maintainer fails fast with
    :class:`ConcurrentRefreshError` (and vice versa) rather than losing
    a delta.  Run at most one maintainer per rollup path.

    Returns the started ``StreamingQuery``.
    """

    def _refresh(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        if batch_df.isEmpty():
            return
        refresh_rollup(
            batch_df.sparkSession,
            batch_df,
            rollup_path,
            step_ms,
            labels,
            buckets_per_chunk,
            distinct_col,
            quantiles,
        )

    writer = stream_df.writeStream.foreachBatch(_refresh).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
