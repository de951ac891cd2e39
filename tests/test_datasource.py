"""Python DataSource ``format("tsdb")`` — the block reader as a first-class
Spark source.  Scans the reference's committed block and must agree exactly
with the established ``tsdb_block.ingest_block`` decode."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tsdb_parquet_spark import datasource as ds
from tsdb_parquet_spark.tsdb_block import block_meta

BLOCK = "/root/reference/01GW1T7K3E9F9R361GDPVH8NZF"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BLOCK), reason="reference block not present"
)


@pytest.fixture(scope="module")
def tsdb_scan(spark):
    ds.register(spark)
    return spark.read.format("tsdb").load(BLOCK)


def test_schema_is_wide_layout(tsdb_scan):
    names = tsdb_scan.columns
    assert names[:2] == ["time", "value"]
    assert "label_name" in names
    assert all(c.startswith("label_") for c in names[2:])


def test_counts_match_block_meta(tsdb_scan):
    meta = block_meta(BLOCK)
    agg = tsdb_scan.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("time").alias("t0"),
        F.countDistinct(*[c for c in tsdb_scan.columns if c.startswith("label_")]).alias(
            "series"
        ),
    ).first()
    assert agg["n"] == meta["stats"]["numSamples"] == 154529
    assert agg["t0"] == meta["minTime"]


def test_partitioned_scan_equals_single_partition(spark, tsdb_scan):
    # series_per_partition=64 → 12 slices of the 767-series block; the
    # union of slices must be exactly the whole block (no dup/lost series
    # at slice boundaries)
    fine = (
        spark.read.format("tsdb")
        .option("series_per_partition", "64")
        .load(BLOCK)
    )
    assert fine.rdd.getNumPartitions() > 1
    a = sorted(tsdb_scan.groupBy("label_name").count().collect())
    b = sorted(fine.groupBy("label_name").count().collect())
    assert a == b


def test_matches_ingest_block_path(spark, tsdb_scan, tmp_path):
    from tsdb_parquet_spark.tsdb_block import ingest_block

    out = str(tmp_path / "via_ingest")
    ingest_block(spark, BLOCK, out)
    via_ingest = spark.read.parquet(out)
    cols = sorted(tsdb_scan.columns)
    assert sorted(via_ingest.columns) == cols
    # exact multiset equality via per-row hash aggregation
    h = lambda df: (  # noqa: E731
        df.select(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]).alias("h"))
        .agg(
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    assert h(tsdb_scan) == h(via_ingest)


def test_query_composition_pushes_into_plan(tsdb_scan):
    # the reference's literal query (hello.go:517-525) composed over the
    # source: matcher filter + projection must run and give Q2's shape
    got = (
        tsdb_scan.filter(
            (F.col("label_name") == "up")
            & (F.col("label_instance") == "localhost:9090")
        )
        .select("time", "value")
        .count()
    )
    assert got > 0


def test_stream_reader_ingests_new_blocks_exactly_once(spark, tmp_path):
    # the reference's converter made continuous: blocks appearing in a
    # Prometheus data dir become micro-batches; offsets (the set of seen
    # ULIDs) checkpoint so a restart ingests only genuinely new blocks
    from tsdb_parquet_spark.tsdb_block import write_block

    ds.register(spark)
    datadir = str(tmp_path / "promdata")
    os.makedirs(datadir)
    schema = "time bigint, value double, label_name string"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_batch():
        q = (
            spark.readStream.format("tsdb")
            .schema(schema)
            .load(datadir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_block(
        os.path.join(datadir, "01AAAAAAAAAAAAAAAAAAAAAAAA"),
        [({"__name__": "m1"}, [(1000, 1.0), (2000, 2.0)])],
        ulid="01AAAAAAAAAAAAAAAAAAAAAAAA",
    )
    run_batch()
    first = spark.read.parquet(out).collect()
    assert sorted((r["time"], r["value"], r["label_name"]) for r in first) == [
        (1000, 1.0, "m1"), (2000, 2.0, "m1"),
    ]

    # a second block appears; restart from the checkpoint → only the diff
    write_block(
        os.path.join(datadir, "01BBBBBBBBBBBBBBBBBBBBBBBB"),
        [({"__name__": "m2"}, [(3000, 3.0)])],
        ulid="01BBBBBBBBBBBBBBBBBBBBBBBB",
    )
    run_batch()
    both = spark.read.parquet(out).collect()
    got = sorted((r["time"], r["value"], r["label_name"]) for r in both)
    assert got == [(1000, 1.0, "m1"), (2000, 2.0, "m1"), (3000, 3.0, "m2")]


def test_filter_pushdown_label_and_time(spark, tsdb_scan):
    # label-eq filters resolve at the series level inside the source
    # (inverted-index parity, SURVEY §4 O5); results must equal the
    # unpushed scan filtered by Spark
    q = (
        (F.col("label_name") == "up")
        & (F.col("label_instance") == "localhost:9090")
        & (F.col("time") > 1679383000000)
        & (F.col("time") < 1679384000000)
    )
    pushed = (
        spark.read.format("tsdb").load(BLOCK)
        .filter(q)
        .select("time", "value")
        .collect()
    )
    # reference answer from the ingested-parquet artifact (same bytes)
    expect = (
        spark.read.parquet("/root/repo/data/tsdb_block")
        .filter(q)
        .select("time", "value")
        .collect()
    )
    assert sorted(pushed) == sorted(expect)
    assert len(pushed) > 0


def test_filter_pushdown_absorbs_label_eq(spark, tsdb_scan):
    # the label equality must disappear from Spark's post-scan Filter
    # (fully pushed), while the time bounds remain (partial)
    df = (
        spark.read.format("tsdb").load(BLOCK)
        .filter((F.col("label_name") == "up") & (F.col("time") > 1679383000000))
        .select("time", "value")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "label_name" not in plan.split("Scan")[0]  # no Spark-side label filter
    assert "time" in plan  # time bound still re-checked by Spark


def test_filter_pushdown_is_null_presence(spark, tsdb_scan):
    got = (
        spark.read.format("tsdb").load(BLOCK)
        .filter(F.col("label_quantile").isNotNull())
        .select("label_name")
        .distinct()
        .collect()
    )
    names = {r["label_name"] for r in got}
    assert names  # quantile series exist
    assert all("duration" in n or "quantile" in n or "seconds" in n for n in names)
