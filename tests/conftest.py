from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tsdb_parquet_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tsdb_parquet_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tsdb_mini(spark):
    """Tiny wide-layout tsdb table with NULL labels — the matcher edge-case
    surface (SURVEY.md §5.2 item 2)."""
    rows = [
        # (time, value, name, instance, job, quantile)
        (1000, 1.0, "up", "a:9090", "prom", None),
        (2000, 0.5, "latency", "a:9090", "prom", "0.5"),
        (3000, 0.9, "latency", "a:9090", "prom", "0.99"),
        (4000, 2.0, "go_goroutines", "b:9090", "prom", None),
        (5000, 3.0, "latency", "b:9090", "prom", ""),
    ]
    return spark.createDataFrame(
        rows, "time long, value double, label_name string, label_instance string, "
        "label_job string, label_quantile string"
    )
