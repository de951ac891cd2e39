"""Generate the NATIVE-HISTOGRAM series fixture (data/tsdb_nh.parquet) —
per-series cumulative native-histogram samples with PLANTED counter
resets, the input q175/q175b/q175e (rate/increase with reset detection,
histogram_sum/_count/_avg accessors, and the promql_expr wiring) are
driver-gated on.

The reference skips non-float samples entirely (``hello.go:489-497``
iterates ``chunkenc.ValFloat`` only), so this is extension surface: the
Prometheus 3.x native (sparse exponential) histogram sample type, stored
one row per scrape in the schema ``native_histogram.py`` defines —
``(time, labels..., count, sum, zero_count, schema, buckets)`` with
``buckets`` a k-sorted sparse ``array<struct<k int, c long>>`` of
CUMULATIVE counter values (bucket k covers ``(2^(k-1), 2^k]`` at
schema 0).

Planted resets (the thing q175 exists to detect): at a reset step the
cumulative state restarts from zero before that step's observations are
added — exactly a counter restart.  Series ``sid=1`` resets at step 150
(INSIDE the q175 30-min window) and ``sid=4`` at steps 60 and 150 (one
outside, one inside), so a rate that ignores resets is provably wrong
against the oracle.

Deterministic: pure integer arithmetic, no RNG.  Sums are kept INTEGRAL
(stored as double) so per-pair deltas and their distributed sums are
IEEE-exact in any engine and any order.

Usage: python scripts/gen_tsdb_nh.py [out_path]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

T_MIN = 1679382479083  # same span as the main fixture (meta.json minTime)
T_MAX = 1679385600000
STEP_MS = 15_000

METRICS = ["http_request_duration_ms", "rpc_latency_ms"]
INSTANCES = ["host1:9100", "host2:9100", "host3:9100"]
KS = list(range(-2, 9))  # sparse bucket universe, incl. the (0,1) span
RESETS = {1: {150}, 4: {60, 150}}  # sid -> reset steps


def obs(i: int, sid: int, k: int) -> int:
    """New observations landing in bucket k at step i — 0..3."""
    return (i * 7 + (k + 2) * 3 + sid * 5) % 4


def zero_obs(i: int, sid: int) -> int:
    return (i + sid) % 2


def generate(out_path: str) -> None:
    times = list(range(T_MIN, T_MAX + 1, STEP_MS))
    cols: dict[str, list] = {
        "time": [], "label_name": [], "label_instance": [],
        "count": [], "sum": [], "zero_count": [], "schema": [],
        "buckets": [],
    }
    sid = 0
    for metric in METRICS:
        for inst in INSTANCES:
            cum = {k: 0 for k in KS}
            c_count, c_sum, c_zero = 0, 0, 0
            for i, t in enumerate(times):
                if i in RESETS.get(sid, ()):  # counter restart
                    cum = {k: 0 for k in KS}
                    c_count, c_sum, c_zero = 0, 0, 0
                z = zero_obs(i, sid)
                c_zero += z
                c_count += z
                for k in KS:
                    o = obs(i, sid, k)
                    cum[k] += o
                    c_count += o
                    # integral "representative value" per observation
                    c_sum += o * max(k + 3, 1)
                cols["time"].append(t)
                cols["label_name"].append(metric)
                cols["label_instance"].append(inst)
                cols["count"].append(c_count)
                cols["sum"].append(float(c_sum))
                cols["zero_count"].append(c_zero)
                cols["schema"].append(0)
                cols["buckets"].append(
                    [{"k": k, "c": cum[k]} for k in KS if cum[k] > 0]
                )
            sid += 1

    bucket_t = pa.list_(
        pa.struct([pa.field("k", pa.int32()), pa.field("c", pa.int64())])
    )
    schema = pa.schema(
        [
            pa.field("time", pa.int64(), nullable=False),
            pa.field("label_name", pa.string(), nullable=False),
            pa.field("label_instance", pa.string(), nullable=False),
            pa.field("count", pa.int64(), nullable=False),
            pa.field("sum", pa.float64(), nullable=False),
            pa.field("zero_count", pa.int64(), nullable=False),
            pa.field("schema", pa.int32(), nullable=False),
            pa.field("buckets", bucket_t, nullable=False),
        ]
    )
    table = pa.table(cols, schema=schema)
    table = table.sort_by(
        [("time", "ascending"), ("label_name", "ascending"),
         ("label_instance", "ascending")]
    )
    pq.write_table(table, out_path, compression="snappy",
                   use_dictionary=True, row_group_size=65536)
    print(f"wrote {out_path}: {table.num_rows} rows, "
          f"{len(METRICS) * len(INSTANCES)} series, "
          f"{len(times)} samples/series")


if __name__ == "__main__":
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "tsdb_nh.parquet",
    )
    generate(sys.argv[1] if len(sys.argv) > 1 else default)
