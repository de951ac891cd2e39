"""Skew-salting correctness, layout advisor, PromQL range functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsdb_parquet_spark.layout import advise_layout
from tsdb_parquet_spark.operators.skew import salted_agg, salted_join
from tsdb_parquet_spark.promql import delta, over_time, rate


def test_salted_agg_matches_plain_groupby(spark):
    # skewed: key 'hot' has 5000 rows, others 10
    rows = [("hot", float(i % 7)) for i in range(5000)] + [
        (f"k{j}", float(j)) for j in range(10) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["n"], round(r["sv"], 6), r["mx"])
        for r in salted_agg(
            df, ["k"], {"n": ("count", ""), "sv": ("sum", "v"), "mx": ("max", "v")}
        ).collect()
    }
    want = {
        r["k"]: (r["n"], round(r["sv"], 6), r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(1000)] + [("cold", i) for i in range(10)],
        "k string, v long",
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, dim long")
    got = sorted(tuple(r) for r in salted_join(big, small, "k").select("k", "v", "dim").collect())
    want = sorted(tuple(r) for r in big.join(small, "k").select("k", "v", "dim").collect())
    assert got == want


def test_advise_layout_scales_with_size(spark):
    small = spark.createDataFrame(
        [(i * 1000, float(i)) for i in range(1000)], "time long, value double"
    )
    a = advise_layout(small)
    assert a.num_files == 1 and a.bucket is None

    # simulate 100 GB by overriding bytes_per_row
    a2 = advise_layout(small, bytes_per_row=100 * 1024 * 1024 * 1024 / 1000)
    assert a2.num_files > 50
    # 1000 s span -> hour buckets would each hold tens of GB (>= min): hour
    assert a2.bucket == "hour"
    assert "range files" in a2.rationale


def test_advise_layout_empty(spark):
    empty = spark.createDataFrame([], "time long, value double")
    a = advise_layout(empty)
    assert a.num_files == 1 and a.rows == 0


def test_over_time_and_delta(spark):
    # one series, two 60 s windows of 3 samples each
    rows = [(t * 1000, float(v), "m") for t, v in
            [(0, 1), (20, 3), (40, 5), (60, 7), (80, 4), (100, 10)]]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    avg = {r["bucket"]: r["avg_over_time"] for r in
           over_time(df, "avg", 60_000, ["label_name"]).collect()}
    assert avg == {0: 3.0, 1: 7.0}
    last = {r["bucket"]: r["last_over_time"] for r in
            over_time(df, "last", 60_000, ["label_name"]).collect()}
    assert last == {0: 5.0, 1: 10.0}
    d = {r["bucket"]: r["delta"] for r in delta(df, 60_000, ["label_name"]).collect()}
    assert d == {0: 4.0, 1: 3.0}


def test_rate_reset_aware_per_window(spark):
    # counter: 0,10,20 | window 2: 30, reset to 5, 15
    rows = [(t * 1000, float(v), "c") for t, v in
            [(0, 0), (20, 10), (40, 20), (60, 30), (80, 5), (100, 15)]]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    out = {r["bucket"]: (r["increase"], r["rate"]) for r in
           rate(df, 60_000, ["label_name"]).collect()}
    # window 0: deltas 10+10 = 20 over 40 s
    assert out[0] == (20.0, 0.5)
    # window 1: cross-window delta (20->30) excluded; reset contributes 5;
    # then +10 => increase 15 over 40 s
    assert out[1] == (15.0, 0.375)


def test_promql_aggregate_by_and_binary_op(spark):
    from tsdb_parquet_spark.promql import aggregate_by, binary_op

    rows = [
        (1000, 2.0, "h1", "200"), (1000, 6.0, "h1", "500"),
        (1000, 3.0, "h2", "200"), (2000, 4.0, "h1", "200"),
    ]
    df = spark.createDataFrame(
        rows, "time long, value double, label_handler string, label_code string"
    )
    s = {(r["time"], r["label_handler"]): r["sum"] for r in
         aggregate_by(df, "sum", ["label_handler"]).collect()}
    assert s == {(1000, "h1"): 8.0, (1000, "h2"): 3.0, (2000, "h1"): 4.0}

    shares = binary_op(df, aggregate_by(df, "sum", ["label_handler"]), "/",
                       on=["label_handler"], right_value="sum", result="share")
    got = sorted(round(r["share"], 4) for r in shares.collect())
    assert got == [0.25, 0.75, 1.0, 1.0]


def test_ingest_increment_idempotent(spark, tmp_path):
    from tsdb_parquet_spark.writer import ingest_increment

    p = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(t, float(t), "m") for t in range(100)],
        "time long, value double, label_name string",
    )
    assert ingest_increment(spark, base, p) == 100
    # overlapping batch: 50 dups + 50 new
    nxt = spark.createDataFrame(
        [(t, float(t), "m") for t in range(50, 150)],
        "time long, value double, label_name string",
    )
    assert ingest_increment(spark, nxt, p) == 50
    assert spark.read.parquet(p).count() == 150
    # full replay appends nothing
    assert ingest_increment(spark, nxt, p) == 0
    assert spark.read.parquet(p).count() == 150
