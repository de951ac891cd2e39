"""Batch window-operator semantics (operators/windows.py) not already
covered by the oracle mirror: the q28 aggregate identity and the pinned
partitioning's plan shape."""

import pyspark.sql.functions as F
import pytest

from tsdb_parquet_spark.operators.windows import sessionize


@pytest.fixture()
def events(spark):
    # two users; user 1 has 3 sessions (gaps > 1800 s), user 2 has 1
    rows = [
        (1, 1_000.0, 1),
        (1, 1_100.0, 2),
        (1, 4_000.0, 3),   # +2900s -> new session
        (1, 9_000.0, 4),   # +5000s -> new session
        (2, 1_000.0, 5),
        (2, 2_500.0, 6),   # +1500s -> same session
    ]
    df = spark.createDataFrame(rows, "user_id long, epoch double, event_id long")
    return df.withColumn("ts", F.timestamp_seconds("epoch")).drop("epoch")


def test_sessionize_assigns_running_ids(events):
    s = sessionize(events, "user_id", "ts", "event_id", gap_seconds=1800)
    got = {(r["user_id"], r["event_id"]): r["session_id"] for r in s.collect()}
    assert got == {
        (1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 3,
        (2, 5): 1, (2, 6): 1,
    }


def test_session_count_max_equals_count_distinct(events):
    # session_id is a per-user running count from 1, so max(session_id)
    # == countDistinct(session_id) — the identity q28 relies on to skip
    # the distinct expansion
    s = sessionize(events, "user_id", "ts", "event_id", gap_seconds=1800)
    a = {r["user_id"]: r["n"] for r in
         s.groupBy("user_id").agg(F.max("session_id").alias("n")).collect()}
    b = {r["user_id"]: r["n"] for r in
         s.groupBy("user_id").agg(F.countDistinct("session_id").alias("n")).collect()}
    assert a == b == {1: 3, 2: 1}


def test_sessionize_single_pinned_exchange(events):
    # one pinned hash exchange on user_id feeds both window functions and
    # the downstream aggregate — no ENSURE_REQUIREMENTS data exchange
    s = sessionize(events, "user_id", "ts", "event_id", gap_seconds=1800)
    agg = s.groupBy("user_id").agg(F.max("session_id").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") == 1
    assert "ENSURE_REQUIREMENTS" not in plan or plan.count("Exchange") == 1


def test_regroup_and_downsample_hashed_key_equals_exact(spark):
    # the 64-bit hashed grouping key is a pure optimization: identical
    # output to the exact multi-string key (incl. NULL label columns,
    # where xxhash64's null-skipping would collide without the sentinel)
    from tsdb_parquet_spark.tables import load_table
    from tsdb_parquet_spark.timeseries import downsample, regroup_series_stats

    tsdb = load_table(spark, "/root/testdata/sf0.001", "tsdb")
    labels = ["label_name", "label_instance", "label_job", "label_quantile"]

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(regroup_series_stats(tsdb, labels, hashed_key=True)) == canon(
        regroup_series_stats(tsdb, labels)
    )
    assert canon(downsample(tsdb, 300_000, labels, hashed_key=True)) == canon(
        downsample(tsdb, 300_000, labels)
    )


def test_hashed_group_key_null_vs_shifted_value_distinct(spark):
    # (NULL,'x') vs ('x',NULL) must be DIFFERENT groups — the case raw
    # xxhash64 merges because it skips null inputs
    from pyspark.sql import functions as F

    from tsdb_parquet_spark.operators.aggregates import hashed_group_key

    df = spark.createDataFrame(
        [(None, "x", 1), ("x", None, 2)], "a string, b string, v int"
    )
    out = df.groupBy(hashed_group_key(df, ["a", "b"]).alias("k")).count().collect()
    assert len(out) == 2
    # ...and raw xxhash64 indeed collides here (documents WHY the helper exists)
    raw = df.select(F.xxhash64("a", "b").alias("h")).distinct().count()
    assert raw == 1
