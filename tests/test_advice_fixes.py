"""Regression tests for the round-3 advisor findings (ADVICE.md r3):

1. parse_selector must not mangle non-ASCII label values (unicode_escape
   round-tripped through latin-1).
2. ingest_increment must stay idempotent when key_cols excludes time.
3. promql avg must skip NULL samples in the denominator (count(v), not
   count(1)).
4. asof_join must return the matched right row's value even when it is
   NULL (DuckDB ASOF parity), not an older non-null value.
5. multimodal fake decode must be seed-independent (crc32, not builtin
   hash()).
"""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from tsdb_parquet_spark.matchers import Matcher, parse_selector


def test_parse_selector_non_ascii_value_roundtrips():
    ms = parse_selector('up{job="café",path="a\\"b\\nc"}')
    assert ms == [
        Matcher("=", "name", "up"),
        Matcher("=", "job", "café"),
        Matcher("=", "path", 'a"b\nc'),
    ]


def test_parse_selector_unknown_escape_passes_through():
    # lenient: a regex escape typed in a quoted value survives verbatim
    ms = parse_selector(r'{handler=~"/api/\d+"}')
    assert ms == [Matcher("=~", "handler", r"/api/\d+")]


def test_ingest_increment_idempotent_without_time_key(spark, tmp_path):
    from tsdb_parquet_spark.writer import ingest_increment

    p = str(tmp_path / "inc_nokey")
    base = spark.range(100).select(
        F.col("id").alias("time"), (F.col("id") % 10).alias("k"),
        F.lit(1.0).alias("value"),
    )
    assert ingest_increment(spark, base, p, key_cols=["k"]) == 100
    # same keys, times OUTSIDE the existing table's range: with the
    # fingerprint on k only, these are duplicates and must NOT append
    later = spark.range(10).select(
        (F.col("id") + 10_000).alias("time"), F.col("id").alias("k"),
        F.lit(2.0).alias("value"),
    )
    assert ingest_increment(spark, later, p, key_cols=["k"]) == 0
    assert spark.read.parquet(p).count() == 100


def test_over_time_avg_skips_nulls(spark):
    from tsdb_parquet_spark.promql import aggregate_by, over_time

    df = spark.createDataFrame(
        [(0, 4.0, "m"), (10, None, "m"), (20, 8.0, "m")],
        "time long, value double, label_name string",
    )
    row = over_time(df, "avg", 1000).collect()[0]
    assert row["avg_over_time"] == 6.0  # (4+8)/2, not (4+8)/3

    by = aggregate_by(
        df.withColumn("time", F.lit(0)), "avg", ["label_name"]
    ).collect()[0]
    assert by["avg"] == 6.0


def test_asof_join_preserves_matched_null_value(spark):
    from tsdb_parquet_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 10), ("k", 30)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 25, None)], "key string, ts long, v double"
    )
    out = {r["ts"]: r["asof_val"] for r in
           asof_join(left, right, "key", "ts", "v").collect()}
    assert out[10] == 1.0
    # matched row at ts=25 has NULL value: the join must return NULL,
    # not carry the older 1.0 forward past it
    assert out[30] is None


def test_fake_decode_is_seed_independent(spark):
    from tsdb_parquet_spark.llm import multimodal as mm

    df = spark.createDataFrame([(1, bytearray(b"abc"))], "item_id long, content binary")
    r = mm.decode_images(df, fake=True).collect()[0]
    c = zlib.crc32(b"abc")
    assert r["width"] == (c & 0x7FF) + 1
    assert r["height"] == ((c >> 11) & 0x7FF) + 1
