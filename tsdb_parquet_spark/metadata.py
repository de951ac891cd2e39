"""Parquet footer inspection — parity with the reference's ``visualize()``
(``/root/reference/hello.go:75-119``), which prints schema, total rows, and
per-row-group / per-column: type, value count, encodings, compressed and
uncompressed byte sizes, compression ratio, and share of the row group.

Spark does not expose Parquet footers, so this reads them with pyarrow —
driver-side, metadata-only (no data pages are read), so it is O(row groups),
not O(rows), and safe to run against very large files.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq


@dataclass
class ColumnChunkInfo:
    column: str
    physical_type: str
    num_values: int
    encodings: tuple[str, ...]
    compression: str
    compressed_bytes: int
    uncompressed_bytes: int
    # stats for pruning audits (row-group skipping on sorted layouts)
    stat_min: object | None
    stat_max: object | None
    null_count: int | None

    @property
    def compression_ratio(self) -> float:
        if self.compressed_bytes == 0:
            return 0.0
        return self.uncompressed_bytes / self.compressed_bytes


@dataclass
class RowGroupInfo:
    index: int
    num_rows: int
    total_byte_size: int
    columns: list[ColumnChunkInfo] = field(default_factory=list)


@dataclass
class ParquetInfo:
    path: str
    num_rows: int
    num_row_groups: int
    schema: str
    created_by: str | None
    row_groups: list[RowGroupInfo] = field(default_factory=list)


def _part_files(path: str) -> list[str]:
    """A single Parquet file, or every part file of a Spark output
    directory (``part-*.parquet``, sorted by name so row groups come back
    in the writer's task order) — lets footer audits run directly on
    ``writer.write_sorted`` output."""
    import glob
    import os

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
        if not parts:
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        return parts
    return [path]


def inspect_parquet(path: str) -> ParquetInfo:
    """Read a Parquet file's (or Spark output directory's) footers and
    return the same facts the reference's inspector prints
    (hello.go:93-118), plus per-column min/max stats.  For a directory the
    per-file row groups are concatenated in filename order."""
    files = _part_files(path)
    first = pq.ParquetFile(files[0])
    info = ParquetInfo(
        path=path,
        num_rows=0,
        num_row_groups=0,
        schema=str(first.schema_arrow),
        created_by=first.metadata.created_by,
    )
    gi_offset = 0
    for fp in files:
        f = pq.ParquetFile(fp)
        md = f.metadata
        info.num_rows += md.num_rows
        info.num_row_groups += md.num_row_groups
        _append_row_groups(info, md, gi_offset)
        gi_offset += md.num_row_groups
    return info


def _append_row_groups(info: ParquetInfo, md, gi_offset: int) -> None:
    for gi in range(md.num_row_groups):
        rg = md.row_group(gi)
        g = RowGroupInfo(index=gi_offset + gi, num_rows=rg.num_rows, total_byte_size=rg.total_byte_size)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            stats = col.statistics
            g.columns.append(
                ColumnChunkInfo(
                    column=col.path_in_schema,
                    physical_type=col.physical_type,
                    num_values=col.num_values,
                    encodings=tuple(col.encodings),
                    compression=col.compression,
                    compressed_bytes=col.total_compressed_size,
                    uncompressed_bytes=col.total_uncompressed_size,
                    stat_min=stats.min if stats and stats.has_min_max else None,
                    stat_max=stats.max if stats and stats.has_min_max else None,
                    null_count=stats.null_count if stats and stats.has_null_count else None,
                )
            )
        info.row_groups.append(g)


def row_group_time_ranges(path: str, column: str = "time") -> list[tuple[object, object]]:
    """Per-row-group (min, max) for one column — the pruning-audit helper:
    on a correctly sorted time-series layout these ranges are monotone and
    barely overlap, so time-range scans skip most groups (SURVEY.md §4 O3)."""
    info = inspect_parquet(path)
    out: list[tuple[object, object]] = []
    for g in info.row_groups:
        for c in g.columns:
            if c.column == column:
                out.append((c.stat_min, c.stat_max))
    return out


def format_info(info: ParquetInfo) -> str:
    """Human-readable rendering, one line per column chunk — the shape of the
    reference's tablewriter output (hello.go:97-118)."""
    lines = [
        f"file: {info.path}",
        f"rows: {info.num_rows}  row groups: {info.num_row_groups}",
        f"created by: {info.created_by}",
        "schema:",
        info.schema,
    ]
    for g in info.row_groups:
        lines.append(f"-- row group {g.index}: {g.num_rows} rows, {g.total_byte_size} bytes")
        for c in g.columns:
            pct = 100.0 * c.compressed_bytes / g.total_byte_size if g.total_byte_size else 0.0
            lines.append(
                f"   {c.column}: {c.physical_type} n={c.num_values} enc={'/'.join(c.encodings)}"
                f" comp={c.compression} {c.compressed_bytes}B/{c.uncompressed_bytes}B"
                f" ratio={c.compression_ratio:.2f} pct={pct:.1f}%"
            )
    return "\n".join(lines)
