"""Streaming CDC materialization: a foreachBatch sink that maintains a
latest-row-wins parquet table (the "current view" a change-log stream
feeds — Debezium/CDC territory, the streaming twin of
``operators/aggregates.latest_by_key``).

Why foreachBatch and not a stateful operator: the materialized CURRENT
TABLE is the product, not a stream of updates — and Structured
Streaming's update-mode aggregates can't overwrite an at-rest parquet
table.  foreachBatch gives each micro-batch a full batch-DataFrame API
plus exactly the idempotence story CDC needs:

- **Merge is idempotent under at-least-once delivery.**  The merge is
  ``latest_by_key(current ∪ batch)`` — re-merging an already-applied
  batch is a no-op (the max of a set doesn't change when you re-add
  members), so foreachBatch's occasional batch replay after recovery
  cannot corrupt the view.
- **Batching-independent.**  With (version, tiebreak) unique per key,
  the final table equals ``latest_by_key`` over the whole history
  regardless of how the stream was chopped into micro-batches — the
  property the correctness gate (q121) checks against the batch oracle.

Scale shape — O(touched partitions), NOT O(table): the view is
partitioned by a stable hash bucket of the key
(``__kb = pmod(xxhash64(keys), n_buckets)``), and each micro-batch

1. compacts the batch to one row per key (one combine-side ``max_by``
   aggregate — shuffle ~ |batch keys|, not |batch rows|),
2. collects the ≤ ``n_buckets`` distinct buckets the batch touches
   (driver-bounded by construction),
3. reads ONLY those bucket directories back (partition pruning on the
   ``__kb`` directory key — asserted in tests via the untouched
   buckets' on-disk files), merges, and
4. dynamic-partition-overwrites exactly those buckets
   (``partitionOverwriteMode=dynamic``, the ``rollup.refresh_rollup``
   pattern) — every other bucket's files are never opened or rewritten.

Per-batch cost is O(|batch| + |touched buckets|), independent of total
view size: the property that keeps a 100 TB current view maintainable
under continuous ingest.  Size ``n_buckets`` so one bucket ≈ a few GB
at the target scale (thousands of buckets at 100 TB; the default 32
suits tests).  Dynamic overwrite commits per-partition rather than
atomically across buckets, so a crash mid-commit can leave a batch
half-applied — the idempotent merge makes the post-recovery replay of
that batch converge to the same state (same reasoning Iceberg/Delta
MERGE would give; the merge algebra is identical).

SINGLE WRITER per view path (Structured Streaming guarantees one
foreachBatch at a time per query); concurrent readers see the old
files until the per-partition commit swaps them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET_COL = "__kb"


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    """Stable key-hash bucket: same key → same bucket, every run, any
    partitioning (xxhash64 is deterministic; pmod folds the sign)."""
    return df.withColumn(
        _BUCKET_COL,
        F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int"),
    )


def read_upsert_view(spark: SparkSession, path: str) -> DataFrame:
    """The maintained current view, without the internal bucket key."""
    return spark.read.parquet(path).drop(_BUCKET_COL)


def upsert_latest_sink(
    path: str,
    keys: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
    n_buckets: int = 32,
):
    """A ``foreachBatch`` function maintaining the latest-by-key view of
    a change-log stream at ``path``.  Use as
    ``stream.writeStream.foreachBatch(upsert_latest_sink(...))``; read
    the result with :func:`read_upsert_view`."""
    from ..operators.aggregates import latest_by_key

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p_cur = jvm.org.apache.hadoop.fs.Path(path)
        fs = p_cur.getFileSystem(conf)

        bl = _with_bucket(
            latest_by_key(batch_df, keys, version_col, tiebreak_col),
            keys, n_buckets,
        )
        if fs.exists(p_cur):
            # bl is evaluated twice (bucket list + merge) — persist so the
            # batch compacts once; state is one row per batch key, small
            bl = bl.persist()
            try:
                touched = [
                    r[0] for r in bl.select(_BUCKET_COL).distinct().collect()
                ]
                current = spark.read.parquet(path).filter(
                    F.col(_BUCKET_COL).isin(touched)
                )
                # __kb rides through max_by's payload struct: it is a pure
                # function of the group keys, so every row of a key agrees
                merged = latest_by_key(
                    current.unionByName(bl), keys, version_col, tiebreak_col
                )
                _write(merged)
            finally:
                bl.unpersist()
        else:
            _write(bl)

    def _write(df: DataFrame) -> None:
        (
            df.repartition(_BUCKET_COL)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET_COL)
            .parquet(path)
        )

    return _merge
