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


def test_range_query_grid_and_staleness(spark):
    from tsdb_parquet_spark.promql import instant_vector, range_query

    # series 'a': samples at 0s and 1000s (a >15-min gap);
    # series 'b': one sample at 100s only
    df = spark.createDataFrame(
        [(0, 1.0, "a"), (1_000_000, 2.0, "a"), (100_000, 9.0, "b")],
        "time long, value double, label_name string",
    )
    out = range_query(df, 0, 1_200_000, 100_000, labels=["label_name"])
    rows = {(r["label_name"], r["step_ts"]): (r["sample_time"], r["value"])
            for r in out.collect()}
    # 'a' live at steps 0..200000 (lookback 300000 exclusive-left) and again
    # from 1000000; stale in between -> absent
    assert rows[("a", 0)] == (0, 1.0)
    assert rows[("a", 200_000)] == (0, 1.0)
    assert ("a", 300_000) not in rows  # time > step-300000 is strict
    assert ("a", 900_000) not in rows
    assert rows[("a", 1_000_000)] == (1_000_000, 2.0)
    assert rows[("a", 1_200_000)] == (1_000_000, 2.0)
    # 'b' live at 100000..300000 then stale forever
    assert rows[("b", 100_000)] == (100_000, 9.0)
    assert rows[("b", 300_000)] == (100_000, 9.0)
    assert ("b", 400_000) not in rows

    # equivalence: every grid cell == an instant_vector evaluation there
    for at in (0, 100_000, 300_000, 1_100_000):
        iv = {(r["label_name"], at): (r["sample_time"], r["value"])
              for r in instant_vector(df, at, labels=["label_name"]).collect()}
        grid_at = {k: v for k, v in rows.items() if k[1] == at}
        assert iv == grid_at


def test_range_query_plan_has_no_join(spark):
    # the scale contract: explode+aggregate, never a steps-x-samples join
    from tsdb_parquet_spark.promql import range_query

    df = spark.createDataFrame(
        [(0, 1.0, "a")], "time long, value double, label_name string"
    )
    plan = range_query(df, 0, 600_000, 60_000, labels=["label_name"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_range_rate_single_sample_window_null_rate(spark):
    from tsdb_parquet_spark.promql import range_rate

    df = spark.createDataFrame(
        [(50_000, 10.0, "m"), (70_000, 30.0, "m")],
        "time long, value double, label_name string",
    )
    out = {r["step_ts"]: (r["increase"], r["rate"])
           for r in range_rate(df, 0, 600_000, 60_000, 120_000,
                               labels=["label_name"]).collect()}
    # step 60000: only sample t=50000 in window -> zero-span, NULL rate
    assert out[60_000] == (0.0, None)
    # step 120000: both samples in window -> inc 20 over 20s span
    assert out[120_000] == (20.0, 1.0)
    # step 180000: window (60000,180000] holds only t=70000 (50000 is out,
    # exclusive left edge) -> single sample again, zero span
    assert out[180_000] == (0.0, None)


def test_salted_running_agg_matches_plain_window(spark):
    # skewed fixture: one hot key with 20k rows, two normal keys
    from pyspark.sql import Window
    from tsdb_parquet_spark.operators.skew import salted_running_agg

    rows = [(t * 100, float(t % 97), "hot") for t in range(20_000)]
    rows += [(t * 5_000, float(t % 13), "k1") for t in range(400)]
    rows += [(t * 7_000 + 3, float(t % 7), "k2") for t in range(300)]
    df = spark.createDataFrame(rows, "ts long, value double, key string")

    for kind in ("sum", "count", "min", "max"):
        got = salted_running_agg(
            df, ["key"], "ts", "value", kind=kind, chunk_span=200_000
        )
        w = Window.partitionBy("key").orderBy("ts").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        import pyspark.sql.functions as SF
        plain_expr = {
            "sum": SF.sum("value"), "count": SF.count(SF.lit(1)),
            "min": SF.min("value"), "max": SF.max("value"),
        }[kind]
        plain = df.withColumn("running", plain_expr.over(w))
        diff = (
            got.select("key", "ts", "running")
            .exceptAll(plain.select("key", "ts", "running"))
            .count()
        )
        assert diff == 0, f"salted {kind} diverges from plain window"

    # the salted plan's windows partition by (key, chunk): the hot key's
    # 20k rows spread over 10 chunks instead of one task
    plan = salted_running_agg(
        df, ["key"], "ts", "value", chunk_span=200_000
    )._jdf.queryExecution().executedPlan().toString()
    assert "_chunk" in plan


def test_gap_fill_methods(spark):
    from tsdb_parquet_spark.timeseries import gap_fill

    # series m: buckets 0,1,4 observed (gap at 2,3); series n: bucket 2 only
    rows = [(0, 10.0, "m"), (1500, 12.0, "m"), (4200, 20.0, "m"), (2500, 7.0, "n")]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")

    locf = {(r["label_name"], r["time"]): (r["value"], r["observed"])
            for r in gap_fill(df, 1000, method="locf").collect()}
    assert locf[("m", 0)] == (10.0, True)
    assert locf[("m", 1000)] == (12.0, True)
    assert locf[("m", 2000)] == (12.0, False)
    assert locf[("m", 3000)] == (12.0, False)
    assert locf[("m", 4000)] == (20.0, True)
    assert locf[("n", 2000)] == (7.0, True)
    assert len(locf) == 6  # grids are per-series, not global

    lin = {r["time"]: round(r["value"], 4)
           for r in gap_fill(df.filter("label_name='m'"), 1000,
                             method="linear").collect()}
    # between bucket 1 (12.0) and bucket 4 (20.0): +8/3 per step
    assert lin[2000] == round(12 + 8 / 3, 4)
    assert lin[3000] == round(12 + 16 / 3, 4)

    zero = {r["time"]: r["value"]
            for r in gap_fill(df.filter("label_name='m'"), 1000,
                              method="zero").collect()}
    assert zero[2000] == 0.0 and zero[1000] == 12.0

    nul = {r["time"]: r["value"]
           for r in gap_fill(df.filter("label_name='m'"), 1000,
                             method="null").collect()}
    assert nul[3000] is None

    # bounded grid: end_ms extends the trailing fill
    ext = {r["time"]: r["value"]
           for r in gap_fill(df.filter("label_name='m'"), 1000,
                             end_ms=6000, method="locf").collect()}
    assert ext[5000] == 20.0 and ext[6000] == 20.0


def test_predict_linear(spark):
    from tsdb_parquet_spark.promql import predict_linear

    # perfect line: v = 100 + 2 * t_seconds, sampled every 15 s
    rows = [(t * 15_000, 100.0 + 2 * (t * 15 - 600), "m") for t in range(41)]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    # at t=600s (the last sample), window 10min, predict 300 s ahead
    r = predict_linear(df, 600_000, 600_000, 300.0).collect()[0]
    assert abs(r["slope"] - 2.0) < 1e-9
    assert abs(r["predicted"] - (100.0 + 2 * 300)) < 1e-6

    single = spark.createDataFrame(
        [(600_000, 5.0, "s")], "time long, value double, label_name string"
    )
    r1 = predict_linear(single, 600_000, 600_000, 60.0).collect()[0]
    assert r1["predicted"] is None and r1["n_samples"] == 1


def test_label_replace_and_join(spark):
    from tsdb_parquet_spark.promql import label_join, label_replace

    df = spark.createDataFrame(
        [(0, 1.0, "up", "host-1:9090", None)],
        "time long, value double, label_name string, label_instance string, "
        "label_job string",
    )
    # extract the host part into a new label
    out = label_replace(df, "host", "$1", "instance", "([^:]+):.*").collect()[0]
    assert out["label_host"] == "host-1"
    # non-matching regex leaves dst unchanged (absent -> stays NULL)
    out2 = label_replace(df, "host", "$1", "job", "(prod-.*)").collect()[0]
    assert out2["label_host"] is None

    j = label_join(df, "key", "/", "name", "instance", "job").collect()[0]
    assert j["label_key"] == "up/host-1:9090/"  # absent job joins as ""


def test_holt_winters_matches_reference_recurrence(spark):
    from tsdb_parquet_spark.promql import holt_winters

    vals = [10.0, 12.0, 11.0, 15.0, 18.0, 17.0]
    rows = [(i * 1000, v, "m") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")

    sf, tf = 0.5, 0.3
    s, b = vals[0], vals[1] - vals[0]
    for x in vals[1:]:
        sp = s
        s = sf * x + (1 - sf) * (s + b)
        b = tf * (s - sp) + (1 - tf) * b

    got = holt_winters(df, 5000, 10_000, sf, tf).collect()
    assert len(got) == 1
    assert abs(got[0]["value"] - s) < 1e-9
    assert got[0]["n_samples"] == 6

    # <2 samples in window -> dropped
    assert holt_winters(df, 0, 500, sf, tf).count() == 0
    with __import__("pytest").raises(ValueError):
        holt_winters(df, 5000, 10_000, 1.5, 0.3)


def test_histogram_quantile_known_values(spark):
    from tsdb_parquet_spark.promql import histogram_quantile

    # cumulative buckets at one instant: le=1 -> 10, le=2 -> 30, +Inf -> 40
    rows = [
        (0, 10.0, "h", "1"), (0, 30.0, "h", "2"), (0, 40.0, "h", "+Inf"),
    ]
    df = spark.createDataFrame(
        rows, "time long, value double, label_handler string, label_le string"
    )
    got = {r["label_handler"]: r["quantile"]
           for r in histogram_quantile(df, 0.5, ["label_handler"]).collect()}
    # rank = 20 -> bucket (1,2]: 1 + (2-1)*(20-10)/(30-10) = 1.5
    assert got["h"] == 1.5

    # q=0.95 -> rank 38 lands in +Inf bucket -> highest finite le
    got95 = histogram_quantile(df, 0.95, ["label_handler"]).collect()[0]
    assert got95["quantile"] == 2.0

    # q=0 -> rank 0 -> first bucket, interpolates to its lower bound 0
    got0 = histogram_quantile(df, 0.0, ["label_handler"]).collect()[0]
    assert got0["quantile"] == 0.0

    # empty group (total 0) dropped
    zero = spark.createDataFrame(
        [(0, 0.0, "z", "1"), (0, 0.0, "z", "+Inf")],
        "time long, value double, label_handler string, label_le string",
    )
    assert histogram_quantile(zero, 0.9, ["label_handler"]).count() == 0


def test_resets_and_changes_over_time(spark):
    from tsdb_parquet_spark.promql import resets_changes_over_time

    # window 0: 5 -> 3 (reset+change), 3 -> 3 (neither), 3 -> 7 (change)
    # window 1: 7 -> 2 (reset+change) but pair crosses the boundary: excluded
    rows = [(t * 1000, v, "c") for t, v in
            [(0, 5.0), (10, 3.0), (20, 3.0), (30, 7.0), (70, 2.0), (80, 2.0)]]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    out = {r["bucket"]: (r["resets"], r["changes"])
           for r in resets_changes_over_time(df, 60_000).collect()}
    assert out[0] == (1, 2)
    assert out[1] == (0, 0)  # cross-boundary pair excluded; 2->2 no change


def test_zorder_prunes_second_dimension(spark, tmp_path):
    # two independent dims: time-sorted layout prunes only time; z-order
    # tightens per-file min/max on BOTH dims, so a user_id-only predicate
    # can skip files again (row-group stats checked via pyarrow footers)
    import os

    import pyarrow.parquet as pq

    from tsdb_parquet_spark.layout import zorder_write

    rows = [(t * 1000, float(t % 7), (t * 48271) % 1024)
            for t in range(20_000)]
    df = spark.createDataFrame(rows, "time long, value double, user_id long")

    tsorted = str(tmp_path / "tsorted")
    df.repartitionByRange(8, "time").sortWithinPartitions("time").write.parquet(tsorted)
    zordered = str(tmp_path / "zorder")
    zorder_write(df, zordered, ["time", "user_id"], num_files=8)

    def files_containing(path, col, probe):
        hits, total = 0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.ParquetFile(os.path.join(path, f))
            idx = md.schema_arrow.get_field_index(col)
            lo = min(md.metadata.row_group(i).column(idx).statistics.min
                     for i in range(md.metadata.num_row_groups))
            hi = max(md.metadata.row_group(i).column(idx).statistics.max
                     for i in range(md.metadata.num_row_groups))
            if lo <= probe <= hi:
                hits += 1
        return hits, total

    t_hits, t_total = files_containing(tsorted, "user_id", 512)
    z_hits, z_total = files_containing(zordered, "user_id", 512)
    assert t_total == z_total == 8
    assert t_hits == t_total          # time-sort: every file spans all users
    assert z_hits < z_total           # z-order: user probe skips files

    # and the z-ordered table still answers queries identically
    a = sorted(spark.read.parquet(zordered).collect())
    b = sorted(df.collect())
    assert a == b


def test_zorder_bits_clamped_to_bigint(spark):
    # default bits=16 with 4 columns would interleave into bit 63+ —
    # sign-flip + Java shift wraparound.  zorder_column must clamp to
    # bits*len(cols) <= 63 and keep every z value non-negative.
    from pyspark.sql import functions as F

    from tsdb_parquet_spark.layout import zorder_column

    rows = [(t, t * 3 % 97, t * 5 % 89, t * 7 % 83) for t in range(2000)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    z = zorder_column(df, ["a", "b", "c", "d"], bits=16)
    stats = z.agg(
        F.min("_z").alias("lo"), F.max("_z").alias("hi")
    ).first()
    assert stats["lo"] >= 0
    # 4 cols -> 15 bits each -> z < 2^60
    assert stats["hi"] < 1 << 60
    # clamped interleave still separates distinct points
    assert z.select("_z").distinct().count() > 100
