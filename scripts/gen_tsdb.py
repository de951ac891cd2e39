"""Generate the deterministic `tsdb` reference-parity fixture (FIXTURES.md §1).

Shaped like the reference's committed Prometheus self-scrape block
(`/root/reference/01GW1T7K3E9F9R361GDPVH8NZF/meta.json` reports 767 series /
154,529 samples over span 1679382479083..1679385600000 ms; this generator
lands at 740 series / 153,965 samples over the same span and label
vocabulary) in the wide physical layout the reference's FrostDB schema
produces (`hello.go:120-157`): fixed
`time` INT64-ms / `value` DOUBLE columns plus one nullable string column per
label name. Rows are written globally sorted by (time, labels) — the
reference's declared sorting columns (`hello.go:148-155`).

Deterministic: numpy PCG64 seed 42, pure-integer phase arithmetic; the
committed parquet is the canonical artifact (regenerating yields the same
bytes modulo parquet writer version).

Usage: python scripts/gen_tsdb.py [out_path]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T_MIN = 1679382479083  # meta.json minTime
T_MAX = 1679385600000  # meta.json maxTime
STEP_MS = 15_000  # 15 s scrape cadence

QUANTILES = ["0.25", "0.5", "0.75", "0.99"]
CODES = ["200", "302", "400", "503"]

BASE_HANDLERS = [
    "/metrics",
    "/api/v1/query",
    "/api/v1/query_range",
    "/api/v1/series",
    "/api/v1/labels",
    "/api/v1/label/:name/values",
    "/api/v1/targets",
    "/api/v1/rules",
    "/api/v1/alerts",
    "/api/v1/status/config",
    "/graph",
    "/static/*filepath",
    "/favicon.ico",
    "/-/healthy",
    "/-/ready",
]

GAUGES = [
    "go_goroutines",
    "go_threads",
    "go_memstats_alloc_bytes",
    "go_memstats_heap_alloc_bytes",
    "go_memstats_heap_idle_bytes",
    "go_memstats_heap_inuse_bytes",
    "go_memstats_heap_objects",
    "go_memstats_sys_bytes",
    "go_memstats_stack_inuse_bytes",
    "go_memstats_gc_sys_bytes",
    "go_memstats_next_gc_bytes",
    "go_memstats_mspan_inuse_bytes",
    "prometheus_tsdb_head_series",
    "prometheus_tsdb_head_chunks",
    "process_resident_memory_bytes",
    "process_virtual_memory_bytes",
    "process_open_fds",
]

COUNTERS = [
    "process_cpu_seconds_total",
    "go_memstats_alloc_bytes_total",
    "go_memstats_mallocs_total",
    "go_memstats_frees_total",
    "prometheus_tsdb_head_samples_appended_total",
    "prometheus_tsdb_compactions_total",
    "prometheus_tsdb_head_chunks_created_total",
    "prometheus_engine_queries_total",
    "prometheus_notifications_sent_total",
    "prometheus_sd_discovered_targets",
]

SUMMARIES = [  # per-quantile series, no handler
    "go_gc_duration_seconds",
    "prometheus_engine_query_duration_seconds",
    "prometheus_rule_evaluation_duration_seconds",
]


def _handlers(n: int = 70) -> list[str]:
    hs = list(BASE_HANDLERS)
    i = 0
    while len(hs) < n:
        hs.append(f"/api/v1/endpoint{i}")
        i += 1
    return hs[:n]


def build_series() -> list[dict]:
    """One dict per series: labels + value-kind."""
    series: list[dict] = []

    def add(name, kind, quantile=None, handler=None, code=None):
        series.append(
            {
                "label_name": name,
                "label_instance": "localhost:9090",
                "label_job": "prometheus",
                "label_quantile": quantile,
                "label_handler": handler,
                "label_code": code,
                "kind": kind,
            }
        )

    add("up", "up")
    for g in GAUGES:
        add(g, "gauge")
    for c in COUNTERS:
        add(c, "counter")
    for s in SUMMARIES:
        for q in QUANTILES:
            add(s, "quantile", quantile=q)
    handlers = _handlers()
    for h in handlers:
        for q in QUANTILES:
            add("prometheus_http_request_duration_seconds", "quantile", quantile=q, handler=h)
        for c in CODES:
            add("prometheus_http_requests_total", "counter", handler=h, code=c)
        add("prometheus_http_response_size_bytes_sum", "counter", handler=h)
        add("prometheus_http_response_size_bytes_count", "counter", handler=h)
    return series


def generate(out_path: str) -> None:
    rng = np.random.default_rng(42)
    series = build_series()

    cols: dict[str, list] = {
        "time": [],
        "value": [],
        "label_name": [],
        "label_instance": [],
        "label_job": [],
        "label_quantile": [],
        "label_handler": [],
        "label_code": [],
    }

    for idx, s in enumerate(series):
        # Per-series phase jitter so timestamps are mostly unique across
        # series; `up` and `go_goroutines` share phase 0 so their timestamps
        # fully collide — exercises Q7's duplicate-preserving sorted merge
        # (reference merge keeps duplicates, ties left-first, hello.go:380-418).
        if s["label_name"] in ("up", "go_goroutines"):
            phase = 0
        else:
            phase = int(rng.integers(0, STEP_MS))
        times = np.arange(T_MIN + phase, T_MAX + 1, STEP_MS, dtype=np.int64)
        n = len(times)

        kind = s["kind"]
        if kind == "up":
            values = np.ones(n)
        elif kind == "counter":
            values = np.cumsum(rng.exponential(scale=50.0, size=n))
        elif kind == "gauge":
            base = float(rng.uniform(10, 1e6))
            values = base + np.cumsum(rng.normal(0, base * 0.01, size=n))
        else:  # quantile
            values = rng.gamma(shape=2.0, scale=0.005, size=n)

        cols["time"].extend(times.tolist())
        cols["value"].extend(np.round(values, 6).tolist())
        for k in ("label_name", "label_instance", "label_job", "label_quantile", "label_handler", "label_code"):
            cols[k].extend([s[k]] * n)

    schema = pa.schema(
        [
            pa.field("time", pa.int64(), nullable=False),
            pa.field("value", pa.float64(), nullable=False),
            pa.field("label_name", pa.string(), nullable=False),
            pa.field("label_instance", pa.string(), nullable=False),
            pa.field("label_job", pa.string(), nullable=False),
            pa.field("label_quantile", pa.string(), nullable=True),
            pa.field("label_handler", pa.string(), nullable=True),
            pa.field("label_code", pa.string(), nullable=True),
        ]
    )
    table = pa.table(cols, schema=schema)
    # Global (time, labels) sort — the reference's physical layout
    # (hello.go:148-155, label columns ascending NULLS FIRST); gives
    # row-group min/max pruning on `time`.
    order = [("time", "ascending")] + [
        (c, "ascending") for c in ("label_name", "label_quantile", "label_handler", "label_code")
    ]
    table = table.sort_by(order, null_placement="at_start")
    pq.write_table(
        table,
        out_path,
        compression="snappy",
        use_dictionary=True,
        row_group_size=65536,
    )
    n_series = len(series)
    print(f"wrote {out_path}: {table.num_rows} rows, {n_series} series")


if __name__ == "__main__":
    default = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "tsdb.parquet")
    generate(sys.argv[1] if len(sys.argv) > 1 else default)
