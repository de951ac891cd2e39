"""Manifest-committed upsert view — a minimal Delta/Iceberg-style
commit log under the CDC sink, for filesystems WITHOUT atomic rename
(verdict r11 #7; reference scope: the converter's write path
``hello.go:499,509`` persists with a plain in-process table write and
no commit protocol — this module is the extension surface that makes
the repo's upsert/maintenance story object-store-correct).

Why a commit log: :mod:`.upsert`'s staged-swap sink is correct on any
filesystem with atomic directory rename (HDFS, local, ABFS).  S3-class
object stores don't have that — a rename is a COPY + DELETE with a
visible in-between — so the production answer there is the one Delta
Lake/Iceberg use: DATA FILES ARE IMMUTABLE, and visibility is a single
atomic manifest PUT.

Layout::

    <path>/_commits/00000000000000000042.json   <- one per commit
    <path>/data/b<batchid>-<uuid>/__kb=K/*.parquet

Each manifest is a FULL SNAPSHOT: ``{"version": v, "buckets":
{"K": "data/<gen>/__kb=K", ...}, "complete": true}`` — the current
view is exactly the union of the listed directories; O(n_buckets)
bytes of JSON per commit, no log replay needed (the Delta-checkpoint
idea applied at every commit, affordable because the mapping is
bucket- not file-grained).

The protocol:

- **Write.**  Each micro-batch writes its merged buckets into a FRESH
  uniquely-named generation directory (never renamed, never
  overwritten), then PUTs manifest ``v+1`` mapping touched buckets to
  the new generation and carrying every untouched bucket's entry
  forward.  Spark's own non-atomic job commit is invisible: nothing
  references the generation dir until the manifest lands.
- **Visibility.**  A single-object PUT is atomic on S3 (an object is
  never visible half-written); on local/HDFS a crash can tear the
  file, so ``"complete": true`` is the LAST key and readers skip any
  manifest that fails to parse, falling back to the previous version.
  The exclusive-create flag (``fs.create(p, overwrite=False)``)
  surfaces writer races where the store supports it.
- **Read.**  Pick the highest parseable manifest, scan its listed
  directories — ONE multi-path parquet scan, no repair step at all
  (contrast ``upsert._recover``): every crash window leaves either the
  old manifest current (orphan generation dir, reclaimed by vacuum) or
  the new one (commit done).  ``__kb`` is a pure function of the keys
  (``pmod(xxhash64(keys), n)``), so it is recomputed when needed,
  never stored.
- **Replay.**  At-least-once batch replay after a crash re-merges
  against whatever manifest is current — idempotent for the same
  reason as the rename sink (max of a set ignores re-added members) —
  and commits a fresh version; versions are allocated at commit time
  one past the highest manifest FILE on disk (parseable or torn), so a
  replayed batch never collides — even with a torn manifest squatting
  on the name the latest-parseable version would suggest.
- **Vacuum.**  :func:`vacuum_manifest_view` deletes generation dirs
  unreferenced by the kept manifest tail and drops older manifests —
  the retention window concurrent readers of older versions get
  (time-travel for free, the Delta pattern).

Per-batch cost is unchanged from the rename sink — O(|batch| +
|touched buckets|), independent of view size; the manifest adds one
tiny JSON read + write per batch.  SINGLE WRITER per view path
(Structured Streaming guarantees one foreachBatch at a time per
query); any number of concurrent readers.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .upsert import _BUCKET_COL, _fs, _hpath, _with_bucket

_COMMITS = "_commits"
_DATA = "data"


def _manifest_name(version: int) -> str:
    return f"{version:020d}.json"


def _read_text(jvm, fs, p) -> str:
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(p), "UTF-8")
    )
    try:
        lines = []
        while True:
            ln = reader.readLine()
            if ln is None:
                break
            lines.append(ln)
        return "\n".join(lines)
    finally:
        reader.close()


def _write_text_exclusive(jvm, fs, p, text: str) -> None:
    # overwrite=False: exclusive create — a second writer racing to the
    # same version fails loudly instead of silently clobbering
    out = fs.create(p, False)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def latest_manifest(
    spark: SparkSession, path: str
) -> tuple[int, dict[str, str]]:
    """(version, bucket->relative-dir) of the newest PARSEABLE manifest,
    or ``(0, {})`` for a fresh view.  Torn manifests (crash mid-PUT on
    a filesystem without atomic object visibility) fail the JSON parse
    and are skipped — the reader falls back one version."""
    jvm, fs = _fs(spark, path)
    return _latest_manifest(jvm, fs, path)


def _list_versions(jvm, fs, path: str) -> list[int]:
    """Every manifest-file version present on disk, parseable or not."""
    cdir = _hpath(jvm, path, _COMMITS)
    if not fs.exists(cdir):
        return []
    versions = []
    for st in fs.listStatus(cdir):
        name = st.getPath().getName()
        if name.endswith(".json"):
            try:
                versions.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return versions


def _next_version(jvm, fs, path: str) -> int:
    """The version the NEXT commit must use: one past the highest
    manifest FILE on disk (not just the highest parseable one).  A
    torn manifest at v+1 still occupies the file name, and the
    exclusive create in :func:`_commit` would fail against it on every
    retry — allocating past every existing file keeps the replay claim
    ("a replayed batch never collides") true through torn writes."""
    versions = _list_versions(jvm, fs, path)
    return (max(versions) + 1) if versions else 1


def _latest_manifest(jvm, fs, path: str) -> tuple[int, dict[str, str]]:
    for v in sorted(_list_versions(jvm, fs, path), reverse=True):
        p = _hpath(jvm, path, _COMMITS, _manifest_name(v))
        try:
            m = json.loads(_read_text(jvm, fs, p))
            if m.get("complete") is True:
                return v, dict(m["buckets"])
        except Exception:
            continue  # torn write — fall back one version
    return 0, {}


def _commit(jvm, fs, path: str, version: int, buckets: dict[str, str]) -> None:
    cdir = _hpath(jvm, path, _COMMITS)
    if not fs.exists(cdir):
        fs.mkdirs(cdir)
    body = json.dumps(
        {"version": version, "buckets": buckets, "complete": True}
    )
    _write_text_exclusive(
        jvm, fs, _hpath(jvm, path, _COMMITS, _manifest_name(version)), body
    )


def upsert_latest_sink_manifest(
    path: str,
    keys: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
    n_buckets: int = 32,
):
    """The manifest-committed twin of ``upsert.upsert_latest_sink``:
    same merge (``latest_by_key(current ∪ batch)`` over touched buckets
    only), same idempotence/batching-independence, but durability via
    immutable generation dirs + an atomic manifest PUT instead of
    per-bucket renames — correct on object stores.  Use as
    ``stream.writeStream.foreachBatch(upsert_latest_sink_manifest(...))``;
    read with :func:`read_manifest_view`."""
    from ..operators.aggregates import latest_by_key

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm, fs = _fs(spark, path)
        _, buckets = _latest_manifest(jvm, fs, path)

        bl = _with_bucket(
            latest_by_key(batch_df, keys, version_col, tiebreak_col),
            keys, n_buckets,
        ).persist()
        try:
            touched = sorted(
                r[0] for r in bl.select(_BUCKET_COL).distinct().collect()
            )
            cur_dirs = [
                f"{path}/{buckets[str(b)]}" for b in touched
                if str(b) in buckets
            ]
            if cur_dirs:
                # generation dirs carry no __kb (partitionBy strips it);
                # recompute — a pure function of the keys.  mergeSchema
                # + allowMissingColumns: a batch may ADD columns (schema
                # evolution) — older generations NULL-fill them
                current = _with_bucket(
                    spark.read.option("mergeSchema", "true").parquet(*cur_dirs),
                    keys, n_buckets,
                )
                merged = latest_by_key(
                    current.unionByName(bl, allowMissingColumns=True),
                    keys, version_col, tiebreak_col,
                )
            else:
                merged = bl
            gen = f"{_DATA}/b{batch_id}-{uuid.uuid4().hex[:12]}"
            (
                merged.repartition(_BUCKET_COL)
                .write.partitionBy(_BUCKET_COL)
                .parquet(f"{path}/{gen}")
            )
        finally:
            bl.unpersist()
        new_buckets = dict(buckets)
        for st in fs.listStatus(_hpath(jvm, path, gen)):
            name = st.getPath().getName()
            if name.startswith(_BUCKET_COL + "="):
                k = name[len(_BUCKET_COL) + 1 :]
                new_buckets[k] = f"{gen}/{name}"
        _commit(jvm, fs, path, _next_version(jvm, fs, path), new_buckets)

    return _merge


def read_manifest_view(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The maintained current view: one multi-path scan of the latest
    manifest's directories.  NO repair step — the commit protocol has
    no crash window a reader can observe (either the old or the new
    manifest is current, and both reference only immutable complete
    generation dirs).

    ``version``: TIME TRAVEL — read the view exactly as manifest
    ``version`` committed it (manifests are full snapshots, so any
    still-retained version reconstructs with one scan; versions past
    the vacuum window raise).  ``merge_schema``: SCHEMA EVOLUTION —
    when later batches added columns, union the generation schemas
    (Spark's mergeSchema; older generations surface the new columns as
    NULL).  Off by default: it costs a footer read per file."""
    if version is None:
        _, buckets = latest_manifest(spark, path)
        if not buckets:
            raise FileNotFoundError(f"no committed manifest under {path}")
    else:
        jvm, fs = _fs(spark, path)
        p = _hpath(jvm, path, _COMMITS, _manifest_name(version))
        if not fs.exists(p):
            raise FileNotFoundError(
                f"manifest version {version} not found under {path} "
                "(past the vacuum retention window, or never committed)"
            )
        m = json.loads(_read_text(jvm, fs, p))
        if m.get("complete") is not True:
            raise ValueError(f"manifest version {version} is torn")
        buckets = dict(m["buckets"])
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[f"{path}/{d}" for d in buckets.values()])


def compact_manifest_view(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> list[str]:
    """Object-store-safe compaction of a manifest view — the
    maintenance twin of ``maintenance.compact_table``, which stages
    via directory RENAMES and therefore needs a rename-capable FS
    (its documented limitation).  Here compaction is just another
    commit: buckets of the CURRENT manifest with >= ``min_files``
    small files (average under half the target) rewrite into a fresh
    generation dir — ``coalesce(ceil(bytes/target))`` — and a new
    manifest points at them.  NO renames, no reader-visible window;
    readers pinned to older manifests keep their files until
    :func:`vacuum_manifest_view` reclaims them.  Returns the bucket
    ids rewritten."""
    import math

    jvm, fs = _fs(spark, path)
    _, buckets = _latest_manifest(jvm, fs, path)
    if not buckets:
        return []
    gen = f"{_DATA}/compact-{uuid.uuid4().hex[:12]}"
    new_buckets = dict(buckets)
    rewritten: list[str] = []
    for k in sorted(buckets):
        d = buckets[k]
        files = [
            st for st in fs.listStatus(_hpath(jvm, path, d))
            if st.getPath().getName().endswith(".parquet")
        ]
        total = sum(st.getLen() for st in files)
        if len(files) < min_files or (
            files and total / len(files) >= target_file_bytes / 2
        ):
            continue
        n_out = max(1, math.ceil(total / target_file_bytes))
        (
            spark.read.parquet(f"{path}/{d}")
            .coalesce(n_out)
            .write.parquet(f"{path}/{gen}/{_BUCKET_COL}={k}")
        )
        new_buckets[k] = f"{gen}/{_BUCKET_COL}={k}"
        rewritten.append(k)
    if rewritten:
        _commit(jvm, fs, path, _next_version(jvm, fs, path), new_buckets)
    return rewritten


def vacuum_manifest_view(
    spark: SparkSession, path: str, keep_manifests: int = 2
) -> dict[str, int]:
    """Reclaim space: drop all but the newest ``keep_manifests``
    manifest files, then delete generation dirs referenced by NONE of
    the kept manifests.  The kept tail is the retention window for
    concurrent readers pinned to older versions (a reader mid-scan of
    version v is safe while v's manifest is kept).  Returns counts
    ``{"manifests_dropped": _, "generations_dropped": _}``."""
    jvm, fs = _fs(spark, path)
    cdir = _hpath(jvm, path, _COMMITS)
    if not fs.exists(cdir):
        return {"manifests_dropped": 0, "generations_dropped": 0}
    versions = _list_versions(jvm, fs, path)
    versions.sort(reverse=True)
    keep, drop = versions[:keep_manifests], versions[keep_manifests:]
    referenced: set[str] = set()
    for v in keep:
        try:
            m = json.loads(
                _read_text(jvm, fs, _hpath(jvm, path, _COMMITS, _manifest_name(v)))
            )
            for d in m.get("buckets", {}).values():
                # "data/<gen>/__kb=K" -> "<gen>"
                parts = d.split("/")
                if len(parts) >= 2 and parts[0] == _DATA:
                    referenced.add(parts[1])
        except Exception:
            continue
    n_manifests = 0
    for v in drop:
        if fs.delete(_hpath(jvm, path, _COMMITS, _manifest_name(v)), False):
            n_manifests += 1
    n_gens = 0
    ddir = _hpath(jvm, path, _DATA)
    if fs.exists(ddir):
        for st in fs.listStatus(ddir):
            name = st.getPath().getName()
            if name not in referenced:
                if fs.delete(st.getPath(), True):
                    n_gens += 1
    return {"manifests_dropped": n_manifests, "generations_dropped": n_gens}
