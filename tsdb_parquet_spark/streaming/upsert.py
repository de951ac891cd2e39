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
suits tests).

DURABILITY — per-bucket STAGED SWAP with rollback (r10; replaces the
r9 dynamic-partition-overwrite commit, whose delete-then-rename window
could permanently lose a bucket's untouched keys if the writer died
between the two): each batch writes its merged buckets to a hidden
``.staging`` dir under the view path, then per touched bucket
(1) renames the live bucket dir to a hidden ``.__bak``,
(2) renames the staged dir into place (one atomic FS rename), and
(3) deletes the ``.__bak``.  No sequence point ever has a bucket's old
data deleted without the new data already in place, so every crash
window is repairable: ``_recover`` (run at the start of every merge
and of every :func:`read_upsert_view`) rolls a dangling ``.__bak``
back if the live dir is missing, discards it if the live dir exists
(the swap had completed), and clears any leftover staging — after
which the idempotent merge makes the checkpoint's replay of the
interrupted batch converge to the same state.  A transactional table
format (Delta/Iceberg) gives the same guarantee via a manifest commit
instead of renames; use one where available — this sink needs only a
filesystem with atomic directory rename (HDFS, local; NOT bare S3 —
front it with a manifest-committing format there).

SINGLE WRITER per view path (Structured Streaming guarantees one
foreachBatch at a time per query); concurrent readers see the old
files until the per-bucket rename swaps them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET_COL = "__kb"
_STAGING = ".staging"
_BAK_SUFFIX = ".__bak"


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    """Stable key-hash bucket: same key → same bucket, every run, any
    partitioning (xxhash64 is deterministic; pmod folds the sign)."""
    return df.withColumn(
        _BUCKET_COL,
        F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int"),
    )


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf)


def _hpath(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(parts))


def _rename_or_die(fs, src, dst) -> None:
    if not fs.rename(src, dst):  # Hadoop rename reports failure as False
        raise IOError(f"upsert swap: rename {src} -> {dst} failed")


def _swap_bucket(fs, staged, live, bak, attempts: int = 3) -> None:
    """Swap one staged bucket dir into place: bak the live dir, rename
    staged in (atomic), drop the bak.  A concurrent READER's tolerant
    recovery can roll the bak back into ``live`` between the two
    renames (read_upsert_view mid-swap); that rollback only ever
    restores OLD data already contained in the staged merge, so the
    swap is simply retried — re-bak and rename again — rather than
    failing the micro-batch (advice r10).  Bounded attempts: anything
    still failing after that is a real FS problem, not the race."""
    for _ in range(attempts):
        if fs.exists(live) and not fs.rename(live, bak):
            continue  # racing reader touched live; re-check and retry
        if fs.rename(staged, live):
            if fs.exists(bak):
                fs.delete(bak, True)
            return
    raise IOError(f"upsert swap: rename {staged} -> {live} failed "
                  f"after {attempts} attempts")


def _recover(spark: SparkSession, path: str, writer: bool = True) -> None:
    """Repair any interrupted swap before touching the view: a dangling
    ``.__kb=K.__bak`` rolls BACK to live if the live dir is missing
    (crash between the two renames) and — on the WRITER path only — is
    discarded if live exists (the staged dir had already swapped in),
    with leftover staging dropped (the checkpoint's batch replay then
    re-derives it).

    The READER path (``writer=False``) must tolerate a LIVE writer
    mid-swap, not just a dead one (advice r10): it never deletes
    anything — a reader that dropped staging or a fresh ``.__bak``
    between the writer's two renames would destroy data the writer
    still needs — and its bak rollback tolerates a failed rename (the
    writer's staged dir just swapped into place, so the live dir
    exists again and the rollback is moot).  The writer's own
    :func:`_swap_bucket` retry absorbs the converse race, a reader's
    rollback landing between the writer's two renames."""
    jvm, fs = _fs(spark, path)
    root = _hpath(jvm, path)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("." + _BUCKET_COL + "=") and name.endswith(_BAK_SUFFIX):
            live = _hpath(jvm, path, name[1:-len(_BAK_SUFFIX)])
            if fs.exists(live):
                if writer:
                    fs.delete(st.getPath(), True)  # roll forward: swap done
            elif writer:
                _rename_or_die(fs, st.getPath(), live)  # roll back old data
            else:
                fs.rename(st.getPath(), live)  # benign if the writer won
    if writer:
        staging = _hpath(jvm, path, _STAGING)
        if fs.exists(staging):
            fs.delete(staging, True)


def read_upsert_view(spark: SparkSession, path: str) -> DataFrame:
    """The maintained current view, without the internal bucket key.
    Repairs any crash-interrupted swap first (reader-tolerant mode:
    never deletes, rollback best-effort), so a reader never sees a
    bucket mid-rename even while the single writer is live."""
    _recover(spark, path, writer=False)
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
        _recover(spark, path)  # repair any interrupted swap first
        jvm, fs = _fs(spark, path)
        p_cur = _hpath(jvm, path)

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
                _write(spark, merged)
            finally:
                bl.unpersist()
        else:
            _write(spark, bl)

    def _write(spark: SparkSession, df: DataFrame) -> None:
        # stage the merged buckets, then swap each into place: bak the
        # live dir, rename staged in (atomic), drop the bak.  Every crash
        # window leaves either old-or-new data live per bucket, never
        # neither — _recover + the idempotent replay converge from any of
        # them (module docstring, DURABILITY).
        staging = f"{path}/{_STAGING}"
        (
            df.repartition(_BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(staging)
        )
        jvm, fs = _fs(spark, path)
        for st in fs.listStatus(_hpath(jvm, staging)):
            name = st.getPath().getName()
            if not name.startswith(_BUCKET_COL + "="):
                continue  # _SUCCESS and friends
            live = _hpath(jvm, path, name)
            bak = _hpath(jvm, path, "." + name + _BAK_SUFFIX)
            _swap_bucket(fs, st.getPath(), live, bak)
        fs.delete(_hpath(jvm, staging), True)

    return _merge
