#!/bin/bash
# Measure the BENCH_SCALING ratio curve: 3 full bench.py runs per scale
# factor (per-query minima recovered by merge_bench_scaling.py), the
# volume-matched execution profile per sf (SCALE.md §5), DuckDB timed
# first inside each run.  Scale dirs come from scripts/gen_scale.py
# chained sf0.1 -> sf1 -> sf10 (tsdb compounds to 100x).
#
# Usage: bash scripts/run_scaling.sh [OUT_DIR] [SCALE_ROOT]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/root/scale/bench_runs}
ROOT=${2:-/root/scale}
mkdir -p "$OUT"

run() { # $1 sf_dir $2 shuffle $3 aqe $4 tag $5 run_idx (tsdb: dir's own if present)
  local tsdb="$1/tsdb.parquet"
  local env_tsdb=()
  [ -f "$tsdb" ] && env_tsdb=(TSDB_SPARK_TSDB_PATH="$tsdb")
  echo "=== $4 run $5 (shuffle=$2 aqe=$3) ===" >&2
  env "${env_tsdb[@]}" SPARK_GRAFT_SF_DIR="$1" \
      SPARK_GRAFT_BENCH_SHUFFLE="$2" SPARK_GRAFT_BENCH_AQE="$3" \
      python3 bench.py 2>/dev/null | tail -1 > "$OUT/$4_run$5.json"
}

for i in 1 2 3; do
  run /root/testdata/sf0.1 8 0 sf0.1 "$i"
  run "$ROOT/sf1" 32 1 sf1 "$i"
  run "$ROOT/sf10" 64 1 sf10 "$i"
done

for sf in 0.1 1 10; do
  python3 scripts/merge_bench_scaling.py "$sf" "$OUT"/sf${sf}_run*.json > "$OUT/point_sf${sf}.json"
done
echo "points written to $OUT/point_sf*.json" >&2
