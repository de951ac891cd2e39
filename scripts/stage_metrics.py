"""Per-stage decomposition of declared queries at a scale dir — the
evidence tool behind SCALE.md's sf100 join-family analysis (verdict
r12 #1): run a ``__spark_entry__.queries()`` entry (twice — the second
run is steady-state: codegen warm, at-rest tables materialized), then
pull per-stage wall / executor-time / input / shuffle bytes from the
Spark UI REST API and print a table.

Usage:
    SPARK_GRAFT_BENCH_SHUFFLE=128 TSDB_SPARK_DRIVER_MEM=48g \
    TSDB_SPARK_TSDB_PATH=/root/scale/sf100/tsdb.parquet \
    python3 scripts/stage_metrics.py /root/scale/sf100 q09_join_agg ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_ts(s: str) -> float:
    # REST timestamps look like "2026-08-16T10:00:00.123GMT"
    return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from tsdb_parquet_spark.session import get_spark

    import __spark_entry__ as m

    shuffle = int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "128"))
    aqe = os.environ.get("SPARK_GRAFT_BENCH_AQE", "1") == "1"
    spark = get_spark(
        app_name="stage_metrics",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.enabled": str(aqe).lower(),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "1000000",
            "spark.sql.execution.arrow.pyspark.selfDestruct.enabled": "true",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages() -> list[dict]:
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    qs = m.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for name in names:
        wall = 0.0
        tbl = None
        before: set[int] = set()
        for _ in range(reps):
            spark.catalog.clearCache()
            before = {(s["stageId"], s["attemptId"]) for s in stages()}
            t0 = time.time()
            tbl = qs[name](spark, sf_dir).toArrow()
            wall = time.time() - t0
        new = [
            s for s in stages()
            if (s["stageId"], s["attemptId"]) not in before
        ]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"== {name}: wall {wall:.2f}s rows={tbl.num_rows} "
              f"(steady-state rep {reps}/{reps}, shuffle={shuffle}, "
              f"aqe={aqe})")
        print(f"{'stage':>6} {'wall_s':>7} {'exec_s':>8} {'tasks':>5} "
              f"{'input':>9} {'sh_read':>9} {'sh_write':>9}  name")
        for s in new:
            try:
                st_wall = _parse_ts(s["completionTime"]) - _parse_ts(
                    s.get("firstTaskLaunchedTime", s["submissionTime"])
                )
            except Exception:
                st_wall = float("nan")
            def mb(k):
                return f"{(s.get(k) or 0) / 1e6:8.1f}M"
            nm = s.get("name", "")[:70]
            print(f"{s['stageId']:>6} {st_wall:>7.2f} "
                  f"{(s.get('executorRunTime') or 0) / 1e3:>8.1f} "
                  f"{s.get('numTasks', 0):>5} {mb('inputBytes')} "
                  f"{mb('shuffleReadBytes')} {mb('shuffleWriteBytes')}  {nm}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
