"""Merge N bench.py output JSONs (same sf) into one BENCH_SCALING point:
per-query minima for BOTH engines (the VM is noisy; minima recover each
engine's capability), serial totals = sum of minima, concurrent wall =
min across runs.

Usage: python scripts/merge_bench_scaling.py [--invalidate=q1,q2]
       [--history=N] SF RUN1.json [RUN2.json ...]
Prints the point JSON to stdout.

``--invalidate``: PLAN-CHANGE honesty (verdict r12 #6 — q09's carried
39.5 s sf100 minimum was measured on the since-removed broadcast
shape).  The named queries' Spark minima ignore the first
``--history`` run files (default 1 — the synthesized prior-round
point); only current-plan runs contribute, so a carried minimum can
never predate the current plan.  The point records the invalidated
names + the dropped historical minima under ``plan_invalidated`` so
the fold's history stays auditable.  DuckDB minima are NOT
invalidated (the oracle SQL did not change with the Spark plan).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = sys.argv[1:]
    invalidate: set[str] = set()
    history = 1
    while args and args[0].startswith("--"):
        if args[0].startswith("--invalidate="):
            invalidate = {q.strip() for q in
                          args[0].split("=", 1)[1].split(",") if q.strip()}
        elif args[0].startswith("--history="):
            history = int(args[0].split("=", 1)[1])
        else:
            raise SystemExit(f"unknown flag {args[0]}")
        args = args[1:]
    sf = float(args[0])
    runs = [json.load(open(p)) for p in args[1:]]
    # union of query keys: the headline set grows across rounds, and old
    # runs stay valid minima sources for the queries they DID measure —
    # a query's min is taken over only the runs that contain it
    queries: list[str] = []
    for r in runs:
        for q in r["queries"]:
            if q not in queries:
                queries.append(q)

    def _min_pos(vals: list[float]) -> float:
        # bench.py records errors as -1.0 — an error is a missing
        # sample, never a candidate minimum (a -1 poisoned the q113
        # fold in r11 when one DuckDB rep errored after its timeout)
        pos = [v for v in vals if v > 0]
        return min(pos) if pos else -1.0

    dropped: dict[str, float] = {}
    if invalidate:
        for q in sorted(invalidate):
            hist = _min_pos([r["queries"][q] for r in runs[:history]
                             if q in r.get("queries", {})])
            if hist > 0:
                dropped[q] = hist

    def _spark_samples(q: str) -> list[float]:
        src = runs[history:] if q in invalidate else runs
        return [r["queries"][q] for r in src if q in r.get("queries", {})]

    sq = {q: _min_pos(_spark_samples(q)) for q in queries}
    dq = {
        q: _min_pos([r["duckdb_queries"][q] for r in runs
                     if q in r.get("duckdb_queries", {})])
        for q in queries
    }
    spark_total = round(sum(sq.values()), 3)
    duck_total = round(sum(dq.values()), 3)
    # Concurrent wall is a SUITE number: comparing it against the
    # union-set DuckDB total is only honest for runs that executed the
    # full union (a run missing queries posts a smaller wall for free —
    # the set grows across rounds, so old runs are serial-minima
    # sources only).
    full = [r for r in runs if set(r["queries"]) == set(queries)]
    assert full, "no run covers the full query-set union; rerun the suite"
    conc = min(r["concurrent_wall_sec"] for r in full)
    point = {
        "sf": sf,
        "n_runs": len(runs),
        "spark_serial_sec": spark_total,
        "duckdb_serial_sec": duck_total,
        "serial_ratio": round(spark_total / duck_total, 3),
        "concurrent_wall_sec": conc,
        "concurrent_ratio": round(conc / duck_total, 3),
        "rows_total": max(r["rows_total"] for r in runs),
        "queries": sq,
        "duckdb_queries": dq,
    }
    if dropped:
        point["plan_invalidated"] = {
            "note": "minima for these queries ignore the historical "
                    "run files (plan changed; those samples measured "
                    "a since-removed shape)",
            "dropped_historical_minima": dropped,
        }
    # propagate DuckDB timeout flags: a capped entry is a LOWER BOUND
    # on DuckDB's time, never a timing — the fold must keep saying so
    touts = sorted({
        q for r in runs for q in r.get("duckdb_timeouts", [])
        if q in queries
    })
    if touts:
        point["duckdb_timeouts"] = touts
    print(json.dumps(point, indent=1))


if __name__ == "__main__":
    main()
