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

Scale shape: each merge is one combine-side ``max_by`` aggregate over
current ∪ batch (shuffle ~ |keys|, not |rows| — aggregates.py
docstring), written to a temp dir and swapped in with the
rename-out/rename-in/rollback dance ``maintenance.compact_partitions``
established.  The full-table rewrite per batch is the simplicity
tradeoff: at 100 TB, partition the view by a stable key hash and
rewrite only partitions the batch touches (dynamic partition overwrite,
the ``rollup.refresh_rollup`` pattern), or put Iceberg/Delta MERGE
underneath — the merge algebra is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_latest_sink(
    path: str,
    keys: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
):
    """A ``foreachBatch`` function maintaining the latest-by-key view of
    a change-log stream at ``path``.  Use as
    ``stream.writeStream.foreachBatch(upsert_latest_sink(...))``."""
    from ..operators.aggregates import latest_by_key

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p_cur = jvm.org.apache.hadoop.fs.Path(path)
        fs = p_cur.getFileSystem(conf)

        batch_latest = latest_by_key(batch_df, keys, version_col, tiebreak_col)
        if fs.exists(p_cur):
            current = spark.read.parquet(path)
            merged = latest_by_key(
                current.unionByName(batch_latest), keys, version_col,
                tiebreak_col,
            )
        else:
            merged = batch_latest

        # write fully BEFORE touching the live dir (the read above is
        # lazy — overwriting in place would read-while-overwriting),
        # then the compact_partitions swap: out, in, rollback-on-fail
        tmp, old = f"{path}__upsert_tmp", f"{path}__upsert_old"
        merged.write.mode("overwrite").parquet(tmp)
        p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
        p_old = jvm.org.apache.hadoop.fs.Path(old)
        if fs.exists(p_old):
            fs.delete(p_old, True)
        if fs.exists(p_cur):
            if not fs.rename(p_cur, p_old):
                raise IOError(f"upsert: cannot stage out {path}")
        if not fs.rename(p_tmp, p_cur):
            if fs.exists(p_old):
                fs.rename(p_old, p_cur)  # roll back
            raise IOError(f"upsert: cannot swap in {tmp}")
        if fs.exists(p_old):
            fs.delete(p_old, True)

    return _merge
