"""Continuous aggregate (hypertable rollup) — incremental == full recompute,
partition-pruned refresh, and streaming maintenance equivalence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.rollup import (
    finalize_rollup,
    merge_rollup_state,
    read_rollup,
    refresh_rollup,
    rollup_state,
    streaming_rollup,
)
from tsdb_parquet_spark.timeseries import downsample

STEP = 3_600_000  # 1 h buckets


def _samples(spark, lo, hi, series=("up", "down"), jitter=0):
    rows = []
    for name in series:
        for t in range(lo, hi, 180_000):  # every 3 min
            rows.append((t + jitter, float((t // 1000) % 997) / 7.0, name))
    return spark.createDataFrame(rows, "time long, value double, label_name string")


def _canon(df):
    return sorted(
        (r["label_name"], r["bucket"], r["n"], round(r["avg_v"], 9), r["min_v"],
         r["max_v"], r["last_v"])
        for r in df.collect()
    )


def test_state_merge_associative(spark):
    full = _samples(spark, 0, 12 * STEP)
    a = full.filter(F.col("time") < 5 * STEP)
    b = full.filter(F.col("time") >= 5 * STEP)
    merged = finalize_rollup(
        merge_rollup_state(rollup_state(a, STEP), rollup_state(b, STEP))
    )
    direct = finalize_rollup(rollup_state(full, STEP))
    assert _canon(merged) == _canon(direct)


def test_incremental_refresh_equals_full_downsample(spark, tmp_path):
    path = str(tmp_path / "rollup")
    full = _samples(spark, 0, 48 * STEP)
    # three refreshes: two chronological appends + one LATE batch that
    # lands back in the first day's buckets (the correctness case a
    # watermark-based streaming agg would have dropped)
    early = full.filter(F.col("time") < 24 * STEP)
    later = full.filter(F.col("time") >= 24 * STEP)
    late = _samples(spark, 2 * STEP, 4 * STEP, series=("up",), jitter=7)
    for delta in (early, later, late):
        refresh_rollup(spark, delta, path, STEP)

    expect = downsample(full.unionByName(late), STEP)
    got = read_rollup(spark, path)
    assert _canon(got) == _canon(expect)


def test_refresh_rewrites_only_affected_chunks(spark, tmp_path):
    path = str(tmp_path / "rollup")
    refresh_rollup(spark, _samples(spark, 0, 96 * STEP), path, STEP)  # 4 chunks
    chunk_dirs = sorted(d for d in os.listdir(path) if d.startswith("chunk="))
    assert len(chunk_dirs) == 4
    before = {
        d: sorted(os.listdir(os.path.join(path, d))) for d in chunk_dirs
    }
    # delta touching only chunk=1 (buckets 24..47)
    refresh_rollup(spark, _samples(spark, 30 * STEP, 31 * STEP, jitter=11), path, STEP)
    after = {d: sorted(os.listdir(os.path.join(path, d))) for d in chunk_dirs}
    assert after["chunk=1"] != before["chunk=1"]
    for d in ("chunk=0", "chunk=2", "chunk=3"):
        assert after[d] == before[d], f"{d} rewritten by an unrelated refresh"


def test_refresh_is_single_writer(spark, tmp_path):
    # a second refresh while the lock is held must fail fast (lost-delta
    # prevention), and the lock must clear after a completed refresh
    import pytest

    from tsdb_parquet_spark.rollup import ConcurrentRefreshError, _refresh_lock

    path = str(tmp_path / "rollup")
    with _refresh_lock(path):  # simulate an in-flight refresh
        with pytest.raises(ConcurrentRefreshError, match="in progress"):
            refresh_rollup(spark, _samples(spark, 0, 2 * STEP), path, STEP)
    # lock released -> refresh proceeds, and releases its own lock
    refresh_rollup(spark, _samples(spark, 0, 2 * STEP), path, STEP)
    assert not os.path.exists(path.rstrip("/") + ".__refresh_lock")
    assert read_rollup(spark, path).count() > 0


def test_streaming_rollup_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    full = _samples(spark, 0, 24 * STEP)
    full.repartition(4).write.parquet(src)  # 4 files → multiple micro-batches

    stream = (
        spark.readStream.schema("time long, value double, label_name string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_rollup(
        stream,
        str(tmp_path / "rollup"),
        str(tmp_path / "ckpt"),
        STEP,
        trigger_available_now=True,
    )
    q.awaitTermination(180)
    got = read_rollup(spark, str(tmp_path / "rollup"))
    assert _canon(got) == _canon(downsample(full, STEP))


def test_hll_distinct_state_merges_exactly(spark):
    # distinct-count sketch state: incremental union must equal the
    # one-shot sketch EXACTLY (sketch merge is associative/lossless), and
    # the estimate must be exact at small cardinalities
    rows = [(t, float(t % 7), "s", f"user{t % 53}") for t in range(0, 4 * STEP, 60_000)]
    full = spark.createDataFrame(
        rows, "time long, value double, label_name string, uid string"
    )
    a = full.filter(F.col("time") < 2 * STEP)
    b = full.filter(F.col("time") >= 2 * STEP)
    kw = dict(labels=["label_name"], distinct_col="uid")
    merged = finalize_rollup(
        merge_rollup_state(rollup_state(a, STEP, **kw), rollup_state(b, STEP, **kw))
    )
    direct = finalize_rollup(rollup_state(full, STEP, **kw))
    m = {r["bucket"]: r["approx_nd"] for r in merged.collect()}
    d = {r["bucket"]: r["approx_nd"] for r in direct.collect()}
    assert m == d
    assert all(v == 53 for v in m.values())  # exact at 53 distinct uids


def test_cli_rollup_refresh(spark, tmp_path, capsys):
    from tsdb_parquet_spark.cli import main

    delta = str(tmp_path / "delta")
    _samples(spark, 0, 4 * STEP).write.parquet(delta)
    rdir = str(tmp_path / "r")
    main(["rollup-refresh", delta, rdir, "--step-ms", str(STEP)])
    assert "(series, bucket) rows" in capsys.readouterr().out
    got = read_rollup(spark, rdir)
    assert got.count() == 8  # 2 series x 4 buckets


def test_time_weighted_avg_trapezoid(spark):
    from tsdb_parquet_spark.timeseries import time_weighted_avg

    # series a: value 1.0 for 10s then jumps to 3.0 for 10s ->
    # trapezoid TWA = (avg(1,1)*10 + avg(1,3)*10) / 20 = 1.5
    # series b: constant 5.0 -> TWA exactly 5.0 regardless of spacing
    # series c: single sample -> dropped (no span)
    rows = [
        ("a", 0, 1.0), ("a", 10_000, 1.0), ("a", 20_000, 3.0),
        ("b", 0, 5.0), ("b", 3_000, 5.0), ("b", 40_000, 5.0),
        ("c", 0, 9.0),
    ]
    df = spark.createDataFrame(rows, "label_s string, time long, value double")
    out = {r["label_s"]: r for r in
           time_weighted_avg(df, labels=["label_s"]).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["twa"] == pytest.approx(1.5, abs=1e-6)
    assert out["a"]["span"] == 20_000 and out["a"]["n"] == 3
    assert out["b"]["twa"] == pytest.approx(5.0, abs=1e-6)


def test_ohlc_bars_invariants(spark):
    from tsdb_parquet_spark.timeseries import ohlc_bars

    rows = [("s", t, v) for t, v in
            [(0, 2.0), (100, 9.0), (200, 1.0), (300, 4.0),   # bucket 0
             (1_000, 7.0), (1_100, 7.5)]]                     # bucket 1
    df = spark.createDataFrame(rows, "label_s string, time long, value double")
    out = {r["bucket"]: r for r in
           ohlc_bars(df, step_ms=1_000, labels=["label_s"]).collect()}
    b0, b1 = out[0], out[1]
    assert (b0["open_v"], b0["high_v"], b0["low_v"], b0["close_v"]) == (2.0, 9.0, 1.0, 4.0)
    assert b0["n"] == 4
    assert (b1["open_v"], b1["close_v"]) == (7.0, 7.5)
    for r in out.values():  # low <= open/close <= high always
        assert r["low_v"] <= r["open_v"] <= r["high_v"]
        assert r["low_v"] <= r["close_v"] <= r["high_v"]


def test_lttb_matches_python_reference(spark):
    import numpy as np

    from tsdb_parquet_spark.timeseries import lttb_downsample

    rng = np.random.RandomState(5)
    n, n_out = 200, 12
    t = np.arange(n) * 1000
    v = np.cumsum(rng.standard_normal(n))
    rows = [("s", int(ti), float(vi)) for ti, vi in zip(t, v)]
    df = spark.createDataFrame(rows, "label_s string, time long, value double")
    got = [(r["time"], r["value"]) for r in
           lttb_downsample(df, n_out, labels=["label_s"])
           .orderBy("time").collect()]

    # independent scalar-loop reference (Steinarsson 2013 pseudocode)
    def ref(t, v, n_out):
        n = len(t)
        every = (n - 2) / (n_out - 2)
        sel, a = [0], 0
        for i in range(n_out - 2):
            lo = int(i * every) + 1
            hi = min(int((i + 1) * every) + 1, n - 1)
            nlo, nhi = hi, min(int((i + 2) * every) + 1, n)
            if nhi > nlo:
                avg_t = sum(t[nlo:nhi]) / (nhi - nlo)
                avg_v = sum(v[nlo:nhi]) / (nhi - nlo)
            else:
                avg_t, avg_v = t[n - 1], v[n - 1]
            best, best_area = lo, -1.0
            for j in range(lo, hi):
                area = abs((t[a] - avg_t) * (v[j] - v[a])
                           - (t[a] - t[j]) * (v[a] - avg_v))
                if area > best_area:
                    best, best_area = j, area
            sel.append(best)
            a = best
        sel.append(n - 1)
        return sel

    want = [(int(t[i]), float(v[i])) for i in ref(list(t), list(v), n_out)]
    assert got == want
    assert got[0][0] == 0 and got[-1][0] == (n - 1) * 1000  # endpoints kept
    # short series pass through untouched
    short = spark.createDataFrame(rows[:5], "label_s string, time long, value double")
    assert lttb_downsample(short, n_out, labels=["label_s"]).count() == 5
