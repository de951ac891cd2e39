"""Scale up the driver's sf0.1 test data by replicating rows with shifted
keys — the standard synthetic scale-up that preserves every distribution
that matters for plan shape (per-key cardinalities, join fan-outs, value
ranges) while multiplying volume.

Replica i of a row gets ``key + i * (max_key + 1)`` for every primary/
foreign key, applied CONSISTENTLY across tables so referential integrity
holds (orders.o_custkey still hits customer.c_custkey, etc.).  Dimension
tables (region, nation) stay fixed, like TPC-H at any sf.  The tsdb
fixture replicates by suffixing ``label_instance`` for i>0 — 10x the
series, with the original series (and therefore every matcher query's
result) intact in replica 0.

Usage: python scripts/gen_scale.py SRC_SF_DIR DST_DIR FACTOR
   eg: python scripts/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10

Writes one parquet per table under DST_DIR (row-group 512k rows) plus
``tsdb.parquet`` (point TSDB_SPARK_TSDB_PATH at it for benching).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    maxes = {
        "c": con.sql(f"SELECT MAX(c_custkey)+1 FROM {t('customer')}").fetchone()[0],
        "s": con.sql(f"SELECT MAX(s_suppkey)+1 FROM {t('supplier')}").fetchone()[0],
        "p": con.sql(f"SELECT MAX(p_partkey)+1 FROM {t('part')}").fetchone()[0],
        "o": con.sql(f"SELECT MAX(o_orderkey)+1 FROM {t('orders')}").fetchone()[0],
        "e": con.sql(f"SELECT MAX(event_id)+1 FROM {t('events')}").fetchone()[0],
        "u": con.sql(f"SELECT MAX(user_id)+1 FROM {t('events')}").fetchone()[0],
        "d": con.sql(f"SELECT MAX(doc_id)+1 FROM {t('documents')}").fetchone()[0],
        "v": con.sql(f"SELECT MAX(vec_id)+1 FROM {t('embeddings')}").fetchone()[0],
    }
    rep = f"CROSS JOIN range({factor}) rr(i)"

    jobs = {
        # dimension tables: fixed, copied verbatim
        "region": f"SELECT * FROM {t('region')}",
        "nation": f"SELECT * FROM {t('nation')}",
        "customer": f"""
            SELECT c_custkey + i*{maxes['c']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {t('customer')} {rep}""",
        "supplier": f"""
            SELECT s_suppkey + i*{maxes['s']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {t('supplier')} {rep}""",
        "part": f"""
            SELECT p_partkey + i*{maxes['p']} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {t('part')} {rep}""",
        "orders": f"""
            SELECT o_orderkey + i*{maxes['o']} AS o_orderkey,
                   o_custkey + i*{maxes['c']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {t('orders')} {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + i*{maxes['o']} AS l_orderkey,
                   l_partkey + i*{maxes['p']} AS l_partkey,
                   l_suppkey + i*{maxes['s']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {t('lineitem')} {rep}""",
        # events stay ts-sorted so time-window row groups prune
        "events": f"""
            SELECT event_id + i*{maxes['e']} AS event_id, ts,
                   user_id + i*{maxes['u']} AS user_id,
                   event_type, value, props
            FROM {t('events')} {rep} ORDER BY ts""",
        "documents": f"""
            SELECT doc_id + i*{maxes['d']} AS doc_id, text, lang, source, n_chars
            FROM {t('documents')} {rep}""",
        "embeddings": f"""
            SELECT vec_id + i*{maxes['v']} AS vec_id, embedding, label
            FROM {t('embeddings')} {rep}""",
    }
    dims = {"region", "nation"}
    for name, q in jobs.items():
        t0 = time.time()
        con.execute(
            f"COPY ({q}) TO '{dst}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 524288)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
        # Compounding invariant: every fact table must carry EXACTLY
        # src_rows * factor (dims stay fixed), so a chained scale-up
        # (sf0.1 -> sf1 -> sf10) compounds to 100x for relational tables
        # the same way the tsdb fixture does — a silent divergence here is
        # how an earlier sf10 point under-scaled the tsdb side (SCALE.md §5).
        n_src = con.sql(f"SELECT count(*) FROM {t(name)}").fetchone()[0]
        want = n_src if name in dims else n_src * factor
        assert n == want, f"{name}: wrote {n} rows, expected {want} (src {n_src} x {factor})"
        print(f"{name}: {n} rows ({time.time()-t0:.1f}s)", flush=True)

    # tsdb fixture: new replicas are new series (suffixed instance),
    # replica 0 bit-identical labels; global (time, labels) sort preserved.
    # Prefer SRC_DIR's own tsdb.parquet so chained scale-ups compound
    # (sf0.1 -> sf1 -> sf10 gives 100x series, not 10x twice from the
    # fixed fixture); fall back to the repo fixture for first-stage runs.
    tsdb_src = os.path.join(src, "tsdb.parquet")
    if not os.path.exists(tsdb_src):
        tsdb_src = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "tsdb.parquet",
        )
    t0 = time.time()
    con.execute(f"""
        COPY (
            SELECT time, value, label_name,
                   CASE WHEN i = 0 THEN label_instance
                        ELSE label_instance || '-r' || i END AS label_instance,
                   label_job, label_quantile, label_handler, label_code
            FROM read_parquet('{tsdb_src}') CROSS JOIN range({factor}) rr(i)
            ORDER BY time, label_name, label_instance
        ) TO '{dst}/tsdb.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 524288)
    """)
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/tsdb.parquet')").fetchone()[0]
    n_src = con.sql(f"SELECT count(*) FROM read_parquet('{tsdb_src}')").fetchone()[0]
    assert n == n_src * factor, (
        f"tsdb: wrote {n} rows, expected {n_src * factor} (src {n_src} x {factor})"
    )
    print(f"tsdb: {n} rows ({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
