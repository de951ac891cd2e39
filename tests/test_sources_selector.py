"""Secondary sources (CSV/JSON round-trip), bucketed co-located joins
(no-Exchange plan assertion), PromQL selector parsing, counter-rate
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark.matchers import Matcher, parse_selector
from tsdb_parquet_spark.sources import read_csv, read_jsonl, write_bucketed
from tsdb_parquet_spark.timeseries import counter_rate


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    p = str(tmp_path / "csv")
    df.write.option("header", "true").csv(p)
    back = read_csv(spark, p, schema="id long, s string, v double")
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a", 1.5), (2, "b", 2.5)]


def test_jsonl_roundtrip_and_corrupt_tolerance(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1, "s": "a"}\n{"id": 2, "s": "b"}\nnot json at all\n')
    out = read_jsonl(
        spark, str(p), schema="id long, s string, _corrupt_record string"
    )
    rows = out.collect()
    good = [(r["id"], r["s"]) for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert sorted(good) == [(1, "a"), (2, "b")]
    assert len(bad) == 1  # corrupt line captured, job not failed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        write_bucketed(a, "bucket_a", "k", num_buckets=4, sort_col="k")
        write_bucketed(b, "bucket_b", "k", num_buckets=4, sort_col="k")
        j = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin with NO Exchange on either side
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bucket_a")
        spark.sql("DROP TABLE IF EXISTS bucket_b")


def test_parse_selector_full():
    ms = parse_selector('up{instance="localhost:9090",job=~"prom.*",code!="500"}')
    assert ms == [
        Matcher("=", "name", "up"),
        Matcher("=", "instance", "localhost:9090"),
        Matcher("=~", "job", "prom.*"),
        Matcher("!=", "code", "500"),
    ]


def test_parse_selector_bare_metric_and_block():
    assert parse_selector("go_goroutines") == [Matcher("=", "name", "go_goroutines")]
    assert parse_selector('{handler!~"/api/.*"}') == [Matcher("!~", "handler", "/api/.*")]


def test_parse_selector_escapes_and_errors():
    ms = parse_selector(r'{path="a\"b"}')
    assert ms == [Matcher("=", "path", 'a"b')]
    with pytest.raises(ValueError):
        parse_selector('up{bad')
    with pytest.raises(ValueError):
        parse_selector('1up')


def test_counter_rate_reset_handling(spark):
    # one series: 0 -> 10 -> 3 (reset) -> 8; increase = 10 + 3 + 5 = 18
    rows = [
        (0, 0.0, "m"), (1000, 10.0, "m"), (2000, 3.0, "m"), (3000, 8.0, "m"),
    ]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    out = counter_rate(df, ["label_name"]).collect()[0]
    assert out["increase"] == 18.0
    assert out["rate"] == 6.0  # 18 over 3 s
    assert out["n_samples"] == 4


def test_counter_rate_agg_form_bit_identical(spark):
    """The no-window aggregate formulation (sort_array(collect_list) +
    HOF delta sum) must match counter_rate exactly, resets and single-
    sample groups included.  (A/B at sf1/sf10-scale tsdb showed the
    window form faster — SCALE.md §6 — so the agg form is the documented
    alternative, kept correct by this test.)"""
    from tsdb_parquet_spark.timeseries import counter_rate_agg

    rows = [
        (0, 0.0, "m"), (1000, 10.0, "m"), (2000, 3.0, "m"), (3000, 8.0, "m"),
        (500, 7.0, "s"),  # single-sample series: rate NULL
    ]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    a = sorted(counter_rate(df, ["label_name"]).collect())
    b = sorted(counter_rate_agg(df, ["label_name"]).collect())
    assert a == b
    assert a[0]["increase"] == 18.0 and a[1]["rate"] is None


def test_rate_agg_form_bit_identical(spark):
    from tsdb_parquet_spark.promql import rate, rate_agg

    # samples spanning two aligned 2s buckets + a reset inside bucket 1
    rows = [
        (0, 1.0, "m"), (900, 4.0, "m"), (1800, 6.0, "m"),  # bucket 0
        (2200, 2.0, "m"), (3100, 9.0, "m"), (3900, 1.0, "m"),  # bucket 1, reset at end
    ]
    df = spark.createDataFrame(rows, "time long, value double, label_name string")
    a = sorted(rate(df, 2000, ["label_name"]).collect())
    b = sorted(rate_agg(df, 2000, ["label_name"]).collect())
    assert a == b
    # bucket 0: (4-1)+(6-4)=5; bucket 1: (9-2)+1(reset)=8 — the cross-
    # bucket 1800->2200 delta counts in NEITHER (both-in-window rule)
    by_bucket = {r["bucket"]: r["increase"] for r in a}
    assert by_bucket == {0: 5.0, 1: 8.0}


def test_udtf_parse_promql(spark):
    from tsdb_parquet_spark.functions import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM parse_promql('up{instance=\"localhost:9090\",code!~\"5..\"}')"
    ).collect()
    assert [(r["name"], r["op"], r["value"]) for r in rows] == [
        ("name", "=", "up"),
        ("instance", "=", "localhost:9090"),
        ("code", "!~", "5.."),
    ]


def test_bpe_ish_tokens(spark):
    from tsdb_parquet_spark.llm.text import bpe_ish_tokens

    df = spark.createDataFrame([("abc123, def!",)], "text string")
    toks = df.select(bpe_ish_tokens("text").alias("t")).collect()[0]["t"]
    assert toks == ["abc", "123", ",", "def", "!"]


def test_pandas_udaf_geometric_mean(spark):
    import math

    from pyspark.sql import functions as F

    from tsdb_parquet_spark.functions import geometric_mean_udaf

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 0.0)], "k string, v double"
    )
    out = {r["k"]: r["gm"] for r in
           df.groupBy("k").agg(geometric_mean_udaf("v").alias("gm")).collect()}
    assert out["a"] == pytest.approx(4.0)       # sqrt(2*8)
    assert out["b"] == pytest.approx(3.0)       # zero filtered out


def test_orc_roundtrip_pushdown(spark, tmp_path):
    from tsdb_parquet_spark.sources import read_orc, write_orc

    df = spark.createDataFrame(
        [(i, float(i), f"k{i%5}") for i in range(1000)],
        "time long, value double, label_name string",
    )
    p = str(tmp_path / "orc_tbl")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.count() == 1000
    assert dict(back.dtypes) == dict(df.dtypes)
    # predicate pushdown reaches the ORC scan
    plan = back.filter(back.time > 500)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(time,500)" in plan
    assert read_orc(spark, p).filter("label_name = 'k1'").count() == 200


def test_binary_dir_multimodal_ingest(spark, tmp_path):
    from tsdb_parquet_spark.llm.multimodal import decode_images
    from tsdb_parquet_spark.sources import binary_dir_to_multimodal, read_binary_dir

    d = tmp_path / "media"
    d.mkdir()
    payloads = {"a.img": b"\x01\x02\x03payload-a", "b.img": b"payload-b" * 100,
                "skip.txt": b"not media"}
    for name, data in payloads.items():
        (d / name).write_bytes(data)

    raw = read_binary_dir(spark, str(d), glob="*.img")
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in raw.collect()}
    assert got == {k: v for k, v in payloads.items() if k.endswith(".img")}

    # metadata-level size guard filters before payload use
    small = read_binary_dir(spark, str(d), glob="*.img", max_bytes=100)
    assert small.count() == 1

    # the bridge emits the multimodal convention and decode runs unchanged
    mm = binary_dir_to_multimodal(spark, str(d), glob="*.img")
    rows = mm.collect()
    assert {r["meta"]["modality"] for r in rows} == {"image"}
    assert all(r["source_bytes"] == len(payloads[r["source_uri"].rsplit("/", 1)[-1]])
               for r in rows)
    decoded = decode_images(mm)
    assert decoded.count() == 2
    assert {r["n_bytes"] for r in decoded.collect()} == {12, 900}
