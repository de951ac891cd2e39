"""Compaction and retention: data-identical rewrites, metadata-only drops,
untouched partitions left byte-identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tsdb_parquet_spark.maintenance import (
    compact_table,
    partition_stats,
    retention_drop,
    table_health,
)


def _mk_table(spark, path, days=3, appends=6):
    """Simulate micro-batch ingest: per dt partition, several tiny appends."""
    for a in range(appends):
        rows = [
            (d * 86_400_000 + a * 1000 + i, float(i * a), f"2023-03-{21 + d:02d}")
            for d in range(days)
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "time long, value double, dt string")
        df.repartition(2).write.mode("append").partitionBy("dt").parquet(path)


def _listing(path):
    return {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("dt=")
    }


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    before_stats = {s.partition: s for s in partition_stats(spark, path)}
    assert all(s.n_files >= 6 for s in before_stats.values())
    before_rows = sorted(spark.read.parquet(path).collect())

    done = compact_table(spark, path, target_file_bytes=256 * 1024 * 1024)
    assert sorted(done) == sorted(before_stats)  # every partition was small

    after_stats = {s.partition: s for s in partition_stats(spark, path)}
    assert all(s.n_files == 1 for s in after_stats.values())
    after_rows = sorted(spark.read.parquet(path).collect())
    assert after_rows == before_rows

    # compacted files are time-sorted inside (row-group pruning survives)
    import pyarrow.parquet as pq

    part = sorted(after_stats)[0]
    fdir = os.path.join(path, part)
    f = [x for x in os.listdir(fdir) if x.endswith(".parquet")][0]
    md = pq.ParquetFile(os.path.join(fdir, f))
    col_idx = md.schema_arrow.get_field_index("time")
    mins = [md.metadata.row_group(i).column(col_idx).statistics.min
            for i in range(md.metadata.num_row_groups)]
    assert mins == sorted(mins)


def test_compact_skips_healthy_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path, days=2)
    compact_table(spark, path, target_file_bytes=256 * 1024 * 1024)
    healthy = _listing(path)
    # second pass: nothing is small+numerous anymore → no partition touched
    assert compact_table(spark, path, target_file_bytes=256 * 1024 * 1024) == []
    assert _listing(path) == healthy


def test_retention_drop_is_partition_scoped(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path, days=3, appends=2)
    keep = _listing(path)["dt=2023-03-23"]

    dropped = retention_drop(spark, path, keep_from="2023-03-23", partition_col="dt")
    assert dropped == ["dt=2023-03-21", "dt=2023-03-22"]
    assert _listing(path) == {"dt=2023-03-23": keep}  # survivors byte-listed intact
    got = spark.read.parquet(path).select(F.col("dt").cast("string")).distinct().collect()
    assert [r[0] for r in got] == ["2023-03-23"]


def test_retention_numeric_chunks(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = [(b * 10 + i, float(i), b) for b in (2, 9, 10, 11) for i in range(5)]
    spark.createDataFrame(rows, "time long, value double, chunk long").write.partitionBy(
        "chunk"
    ).parquet(path)
    # numeric compare: chunk=9 < 10 drops, chunk=10/11 stay (a lexical
    # compare would wrongly drop chunk=10 and chunk=11)
    dropped = retention_drop(spark, path, keep_from="10")
    assert dropped == ["chunk=2", "chunk=9"]
    left = sorted(r["chunk"] for r in spark.read.parquet(path).select("chunk").distinct().collect())
    assert left == [10, 11]


def test_table_health(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path, days=2, appends=3)
    h = table_health(spark, path)
    assert h["partitions"] == 2
    assert h["files"] >= 6
    assert sorted(h["small_file_partitions"]) == ["dt=2023-03-21", "dt=2023-03-22"]


def test_vacuum_removes_interrupted_compaction_debris(spark, tmp_path):
    from tsdb_parquet_spark.maintenance import vacuum

    path = str(tmp_path / "t")
    _mk_table(spark, path, days=1, appends=2)
    # simulate a compaction that died mid-swap
    os.makedirs(os.path.join(path, "dt=2023-03-21__compact_tmp"))
    os.makedirs(os.path.join(path, "dt=2023-03-21__compact_old"))
    removed = vacuum(spark, path)
    assert removed == [
        "dt=2023-03-21__compact_old", "dt=2023-03-21__compact_tmp",
    ]
    assert vacuum(spark, path) == []  # idempotent
    assert spark.read.parquet(path).count() > 0


def test_vacuum_restores_primary_lost_mid_swap(spark, tmp_path):
    """Crash BETWEEN stage-out (cur->old) and swap-in (tmp->cur): the
    primary dir is missing and old/tmp hold the only copies.  vacuum must
    complete the swap (tmp in, old deleted), never delete the data."""
    import shutil

    from tsdb_parquet_spark.maintenance import vacuum

    path = str(tmp_path / "t")
    _mk_table(spark, path, days=1, appends=2)
    part = os.path.join(path, "dt=2023-03-21")
    rows_before = sorted(
        spark.read.parquet(path).drop("dt").collect()
    )
    # simulate: tmp fully written (copy), then cur renamed to old, crash
    shutil.copytree(part, part + "__compact_tmp")
    os.rename(part, part + "__compact_old")
    assert not os.path.exists(part)

    removed = vacuum(spark, path)
    assert removed == [
        "dt=2023-03-21__compact_old",
        "restored:dt=2023-03-21__compact_tmp",
    ]
    assert os.path.isdir(part)
    assert sorted(spark.read.parquet(path).drop("dt").collect()) == rows_before
    assert vacuum(spark, path) == []


def test_vacuum_restores_from_old_when_no_tmp(spark, tmp_path):
    """Degenerate debris: primary missing and only __compact_old exists
    (e.g. tmp was partially deleted by hand) — roll back old."""
    from tsdb_parquet_spark.maintenance import vacuum

    path = str(tmp_path / "t")
    _mk_table(spark, path, days=1, appends=2)
    part = os.path.join(path, "dt=2023-03-21")
    n = spark.read.parquet(path).count()
    os.rename(part, part + "__compact_old")

    removed = vacuum(spark, path)
    assert removed == ["restored:dt=2023-03-21__compact_old"]
    assert spark.read.parquet(path).count() == n


def test_cli_health_and_retention(spark, tmp_path, capsys):
    from tsdb_parquet_spark.cli import main

    path = str(tmp_path / "t")
    _mk_table(spark, path, days=2, appends=2)
    main(["health", path])
    assert "'partitions': 2" in capsys.readouterr().out
    main(["retention", path, "2023-03-22", "--col", "dt"])
    assert "dropped 1 partition(s)" in capsys.readouterr().out


def test_cli_vacuum(spark, tmp_path, capsys):
    from tsdb_parquet_spark.cli import main

    path = str(tmp_path / "t")
    _mk_table(spark, path, days=1, appends=2)
    os.makedirs(os.path.join(path, "dt=2023-03-21__compact_tmp"))
    main(["vacuum", path])
    assert "vacuumed 1 item(s)" in capsys.readouterr().out
    main(["vacuum", path])
    assert "vacuumed 0 item(s)" in capsys.readouterr().out


def test_cli_bm25_and_lttb(spark, tmp_path, capsys):
    from tsdb_parquet_spark.cli import main

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, "beta gamma"), (2, "alpha")],
        "doc_id long, text string",
    ).write.parquet(docs)
    main(["bm25", docs, "alpha", "--topk", "2"])
    out = capsys.readouterr().out
    assert "bm25" in out and "doc_id" in out

    ts = str(tmp_path / "ts")
    spark.createDataFrame(
        [("a", t * 1000, float(t % 7)) for t in range(50)],
        "label_s string, time long, value double",
    ).write.parquet(ts)
    main(["lttb", ts, "--n-out", "10", "--labels", "label_s"])
    out = capsys.readouterr().out
    assert "(10 rows)" in out


def test_cli_funnel_cohort_budget(spark, tmp_path, capsys):
    from datetime import datetime

    from tsdb_parquet_spark.cli import main

    ev = str(tmp_path / "ev")
    spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), "a"),
            (1, datetime(2024, 1, 1, 0, 5), "b"),
            (2, datetime(2024, 1, 9, 0, 0), "a"),
        ],
        "user_id long, ts timestamp, event_type string",
    ).write.parquet(ev)
    main(["funnel", ev, "a", "b", "--within-min", "30"])
    out = capsys.readouterr().out
    assert "|1   |a         |2    |" in out and "|2   |b         |1    |" in out

    main(["cohort", ev, "--period", "week"])
    out = capsys.readouterr().out
    assert "2024-01-01" in out and "2024-01-08" in out and "(2 rows)" in out

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "g", 10) for i in range(6)],
        "doc_id long, source string, n_chars int",
    ).write.parquet(docs)
    main(["budget-select", docs, "25", "--group-col", "source"])
    out = capsys.readouterr().out
    assert "(3 rows selected)" in out  # 10+10 < 25, third crosses, fourth not


def test_tiered_retention_frontier_gates_raw_drop(spark, tmp_path):
    # the hypertable lifecycle: raw partitions drop ONLY once every
    # rollup's ingest frontier has passed the cutoff — a lagging rollup
    # aborts the whole drop (partial tiering = silent data loss)
    from tsdb_parquet_spark.maintenance import tiered_retention
    from tsdb_parquet_spark.rollup import refresh_rollup

    step = 3_600_000
    raw = str(tmp_path / "raw")
    rows = [(d, t + d * 86_400_000, float(t % 7), "up")
            for d in range(3) for t in range(0, 4 * step, step // 4)]
    df = spark.createDataFrame(
        rows, "day int, time long, value double, label_name string")
    df.withColumn("dt", F.concat(F.lit("2024-01-0"), (F.col("day") + 1))) \
      .drop("day").write.partitionBy("dt").parquet(raw)

    ru = str(tmp_path / "rollup_1h")
    # roll up only days 1-2: frontier stops before day 3
    refresh_rollup(
        spark, spark.read.parquet(raw).filter("time < 2 * 86400000"), ru, step)

    cutoff = 86_400_000  # drop raw below day 2
    out = tiered_retention(spark, raw, "2024-01-02", cutoff, [ru])
    assert out["dropped"] == ["dt=2024-01-01"]
    assert out["frontiers"][ru] >= cutoff

    # a cutoff past the rollup frontier refuses and drops nothing
    import pytest as _pytest
    with _pytest.raises(ValueError, match="frontier"):
        tiered_retention(spark, raw, "2024-01-03", 3 * 86_400_000, [ru])
    left = {str(r.dt) for r in spark.read.parquet(raw).select("dt").distinct().collect()}
    assert left == {"2024-01-02", "2024-01-03"}


def test_cli_tiered_retention(spark, tmp_path, capsys):
    from tsdb_parquet_spark.cli import main
    from tsdb_parquet_spark.rollup import refresh_rollup

    raw = str(tmp_path / "raw")
    rows = [(d, t + d * 86_400_000, float(t % 5), "up")
            for d in range(2) for t in range(0, 7_200_000, 1_800_000)]
    df = spark.createDataFrame(
        rows, "day int, time long, value double, label_name string")
    df.withColumn("dt", F.concat(F.lit("2024-01-0"), (F.col("day") + 1))) \
      .drop("day").write.partitionBy("dt").parquet(raw)
    ru = str(tmp_path / "ru")
    refresh_rollup(spark, spark.read.parquet(raw), ru, 3_600_000)

    main(["tiered-retention", raw, "2024-01-02", "86400000", "--rollup", ru])
    out = capsys.readouterr().out
    assert "dropped 1 partition(s): ['dt=2024-01-01']" in out


def test_tiered_retention_per_series_frontier_catches_lagging_series(spark, tmp_path):
    # one series refreshed through day 3, the other only day 1: the
    # per-series frontier (default) refuses the day-2 cutoff that the
    # overstated global max would green-light
    from tsdb_parquet_spark.maintenance import tiered_retention
    from tsdb_parquet_spark.rollup import refresh_rollup

    step = 3_600_000
    raw = str(tmp_path / "raw")
    rows = [(n, t, float(t % 5)) for n in ("up", "down")
            for t in range(0, 3 * 86_400_000, 6 * step)]
    df = spark.createDataFrame(rows, "label_name string, time long, value double")
    df.withColumn("dt", F.concat(F.lit("2024-01-0"),
                                 (F.floor(F.col("time") / 86_400_000) + 1))) \
      .write.partitionBy("dt").parquet(raw)

    ru = str(tmp_path / "ru")
    base = spark.read.parquet(raw)
    refresh_rollup(spark, base.filter("label_name = 'up'"), ru, step)
    refresh_rollup(
        spark, base.filter("label_name = 'down' AND time < 86400000"),
        ru, step)

    import pytest as _pytest
    cutoff = 2 * 86_400_000
    with _pytest.raises(ValueError, match="frontier"):
        tiered_retention(spark, raw, "2024-01-03", cutoff, [ru])
    # the global mode (explicit opt-in) would have allowed it
    out = tiered_retention(spark, raw, "2024-01-03", cutoff, [ru],
                           frontier="global")
    assert out["dropped"] == ["dt=2024-01-01", "dt=2024-01-02"]


def test_cli_cusum_autocorr_heatmap(spark, tmp_path, capsys):
    from tsdb_parquet_spark.cli import main

    path = str(tmp_path / "ts")
    rows = [("up", t, float(v)) for t, v in
            enumerate([1, 1, 9, 9, 9, 1, 1, 1], start=1)]
    spark.createDataFrame(
        rows, "label_name string, time long, value double").write.parquet(path)

    main(["cusum", path, "2.0", "10.0"])
    out = capsys.readouterr().out
    assert "cusum_u" in out and "(5 rows)" in out  # drift alarms persist t4-t8
    main(["autocorr", path])
    out = capsys.readouterr().out
    assert "autocorr" in out and "(1 rows)" in out
    main(["heatmap", path, "--step-ms", "4", "--value-width", "5"])
    out = capsys.readouterr().out
    assert "v_bucket" in out and "(5 rows)" in out
