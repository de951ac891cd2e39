"""Standing sweep: no oracle may emit a DuckDB HUGEINT column.

Postmortem (SCALE.md "the oracle width trap"): an uncasted
``SUM(BIGINT)`` in DuckDB types as HUGEINT -> Arrow decimal128(38,0),
while the Spark side of the same query emits ``bigint``.  The driver's
correctness gate hashes VALUES per Arrow type, so the two sides
hash-mismatch even when every row is identical.  This shipped three
times (q92b r7, q104/q106 r8) because the local harness normalized via
``str(v)`` and could not see it.  This test DESCRIBEs every oracle —
types only, no execution — and fails the build on any HUGEINT column,
so the class can never ship again.
"""

from __future__ import annotations

import os

import pytest


def test_q113_driver_sf_stays_on_exact_path():
    """q113's oracle is bit-exact only on the k<=8 plan-literal path;
    the numpy matmul path (k>8, count//64 > 8) can flip argmax/near-
    threshold decisions by a summation-order ulp.  The driver verifies
    at sf0.01, so PIN that its fixture keeps k=8 — if the embeddings
    fixture ever grows past 512 rows, this fails loudly instead of the
    driver gate failing spuriously (advice r9)."""
    import duckdb

    path = "/root/testdata/sf0.01/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver fixture not present")
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
    assert max(8, n // 64) == 8, (
        f"sf0.01 embeddings grew to {n} rows: q113's driver verification "
        "would leave the oracle-bit-exact k<=8 path — re-pin the oracle "
        "or gate the numpy path on a verification flag"
    )

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tsdb_parquet_spark.tables import TABLE_NAMES, table_path  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    return c


def test_no_hugeint_in_any_oracle(con):
    """DESCRIBE every oracle_sql() entry; no column may be HUGEINT.

    DESCRIBE resolves output types without running the query, so the
    full 147-oracle sweep is sub-second.  A HUGEINT here means an
    uncasted SUM/aggregate over BIGINT that the Spark twin cannot
    match — add CAST(... AS BIGINT) in the oracle.
    """
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        rows = con.execute("DESCRIBE " + sql).fetchall()
        for col, typ, *_ in rows:
            t = typ.upper()
            if "HUGEINT" in t or "INT128" in t:
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle columns with 128-bit integer width (driver hash will "
        "mismatch Spark bigint even on identical values): " + "; ".join(bad)
    )
