"""Theta-sketch set algebra and KLL rollup quantile state: exact at small
cardinality, mergeable, and consistent across incremental splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsdb_parquet_spark.operators.sketches import retention, theta_set_compare


def _events(spark, day, users):
    return spark.createDataFrame(
        [(day, u) for u in users], "day string, user_id long"
    )


def test_theta_set_compare_exact_small(spark):
    a = _events(spark, "d1", range(0, 100))        # users 0..99
    b = _events(spark, "d2", range(50, 120))       # users 50..119
    a = a.withColumn("k", F.lit("x"))
    b = b.withColumn("k", F.lit("x"))
    row = theta_set_compare(a, b, ["k"], "user_id").first()
    assert row["n_a"] == 100 and row["n_b"] == 70
    assert row["n_union"] == 120
    assert row["n_intersect"] == 50
    assert row["n_a_only"] == 50 and row["n_b_only"] == 20


def test_theta_missing_side_is_empty_set(spark):
    a = _events(spark, "d1", range(10)).withColumn("k", F.lit("only_a"))
    b = _events(spark, "d2", range(5)).withColumn("k", F.lit("only_b"))
    rows = {r["k"]: r for r in theta_set_compare(a, b, ["k"], "user_id").collect()}
    ra, rb = rows["only_a"], rows["only_b"]
    assert ra["n_a"] == 10 and ra["n_b"] == 0 and ra["n_intersect"] == 0
    assert ra["n_a_only"] == 10 and ra["n_union"] == 10
    assert rb["n_b"] == 5 and rb["n_a"] == 0 and rb["n_b_only"] == 5


def test_retention_between_periods(spark):
    ev = _events(spark, "2023-01-01", range(0, 80)).unionByName(
        _events(spark, "2023-01-02", range(40, 100))
    )
    row = retention(ev, "day", "2023-01-01", "2023-01-02").first()
    assert row["n_a"] == 80 and row["n_b"] == 60
    assert row["retained"] == 40
    assert row["churned"] == 40


def test_kll_quantile_state_merges_consistently(spark):
    from tsdb_parquet_spark.rollup import (
        finalize_rollup,
        merge_rollup_state,
        rollup_state,
    )

    STEP = 3_600_000
    rows = [(t, float((t // 10_000) % 1000), "s") for t in range(0, 2 * STEP, 10_000)]
    full = spark.createDataFrame(rows, "time long, value double, label_name string")
    a = full.filter(F.col("time") % 20_000 == 0)
    b = full.filter(F.col("time") % 20_000 != 0)
    kw = dict(labels=["label_name"], quantiles=True)
    merged = finalize_rollup(
        merge_rollup_state(rollup_state(a, STEP, **kw), rollup_state(b, STEP, **kw))
    )
    got = {r["bucket"]: r for r in merged.collect()}
    # bucket b holds values b*360 .. b*360+359 uniformly; KLL rank error
    # at k=200 over 360 samples is small — assert within a loose band
    for bkt, r in got.items():
        lo = bkt * 360
        assert abs(r["p50"] - (lo + 179.5)) < 40
        assert abs(r["p95"] - (lo + 342)) < 40
        assert r["p50"] < r["p95"] <= r["p99"] <= lo + 359
    # merged state must agree with one-shot state estimates (KLL merge is
    # not bit-deterministic, so compare estimates within rank error)
    direct = {r["bucket"]: r for r in
              finalize_rollup(rollup_state(full, STEP, **kw)).collect()}
    for bkt, r in got.items():
        assert abs(r["p50"] - direct[bkt]["p50"]) < 40
