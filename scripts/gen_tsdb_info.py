"""Generate the `tsdb_info` fixture (data/tsdb_info.parquet) — a
second, tiny tsdb-layout table WITH a Prometheus ``target_info``
metric, so ``info()``'s DEFAULT selector (``{name=~".+_info"}``) is
driver-gateable (q174b; verdict r12 #8).  The main fixture
deliberately has no ``*_info`` metric (the default selector matching
nothing there is itself a tested property), hence a separate file.

Layout mirrors ``gen_tsdb.py`` (wide: time INT64-ms, value DOUBLE, one
nullable string column per label) with the info-style label vocabulary:
identifying labels ``instance``/``job`` plus DATA labels
``version``/``env`` carried ONLY by the ``target_info`` series — the
labels info() donates onto the other metrics of the same target.

Deterministic: pure integer arithmetic, no RNG.

Usage: python scripts/gen_tsdb_info.py [out_path]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T_MIN = 1679382479083  # same span as the main fixture
T_MAX = 1679385600000
STEP_MS = 15_000

# (instance, version, env) — one scrape target each
TARGETS = [
    ("host1:9100", "1.2.3", "prod"),
    ("host2:9100", "1.2.4", "staging"),
    ("host3:9100", "2.0.0", "prod"),
]
METRICS = ["node_cpu_usage", "node_memory_usage"]


def generate(out_path: str) -> None:
    cols: dict[str, list] = {
        "time": [],
        "value": [],
        "label_name": [],
        "label_instance": [],
        "label_job": [],
        "label_version": [],
        "label_env": [],
    }
    times = np.arange(T_MIN, T_MAX + 1, STEP_MS, dtype=np.int64)

    def add(name, instance, version, env, values):
        n = len(times)
        cols["time"].extend(times.tolist())
        cols["value"].extend(values)
        cols["label_name"].extend([name] * n)
        cols["label_instance"].extend([instance] * n)
        cols["label_job"].extend(["node"] * n)
        cols["label_version"].extend([version] * n)
        cols["label_env"].extend([env] * n)

    for i, (inst, version, env) in enumerate(TARGETS):
        # the info series: value fixed at 1, data labels set
        add("target_info", inst, version, env, [1.0] * len(times))
        for m_idx, metric in enumerate(METRICS):
            # deterministic sawtooth per (target, metric)
            vals = [
                float(10 * (i + 1) + m_idx + (s % 7)) / 2.0
                for s in range(len(times))
            ]
            add(metric, inst, None, None, vals)

    schema = pa.schema(
        [
            pa.field("time", pa.int64(), nullable=False),
            pa.field("value", pa.float64(), nullable=False),
            pa.field("label_name", pa.string(), nullable=False),
            pa.field("label_instance", pa.string(), nullable=False),
            pa.field("label_job", pa.string(), nullable=False),
            pa.field("label_version", pa.string(), nullable=True),
            pa.field("label_env", pa.string(), nullable=True),
        ]
    )
    table = pa.table(cols, schema=schema)
    table = table.sort_by(
        [("time", "ascending"), ("label_name", "ascending"),
         ("label_instance", "ascending")],
        null_placement="at_start",
    )
    pq.write_table(table, out_path, compression="snappy",
                   use_dictionary=True, row_group_size=65536)
    print(f"wrote {out_path}: {table.num_rows} rows, "
          f"{len(TARGETS) * (1 + len(METRICS))} series")


if __name__ == "__main__":
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "tsdb_info.parquet",
    )
    generate(sys.argv[1] if len(sys.argv) > 1 else default)
