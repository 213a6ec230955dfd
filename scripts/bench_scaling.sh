#!/bin/bash
# Two-cluster-size scaling benchmark (north rule: N vs 4N executors,
# efficiency >= 0.8). Runs each phase in its own spark-submit JVM at
# local[8] and local[32] on identical cached input; min-of-3 passes.
# Usage: scripts/bench_scaling.sh [data_root]
set -e
cd "$(dirname "$0")/.."
ROOT="${1:-BENCH/data/scaling}"
NF=4000000; NO=2000000; NI=1000000; NIO=1000000
rm -f /tmp/engine.zip && zip -qr /tmp/engine.zip feature_store_spark
mkdir -p "$ROOT" BENCH

run() { # cores phase
  spark-submit --master "local[$1]" --py-files /tmp/engine.zip \
    --conf spark.ui.enabled=false --driver-memory 8g \
    scripts/bench_job.py "$ROOT" $NF $NO $NI $NIO "$2" 3 2>/dev/null \
    | grep BENCHJSON | sed 's/^BENCHJSON //'
}

echo "== generating cache (one-time, local[32]) =="
spark-submit --master 'local[32]' --py-files /tmp/engine.zip \
  --conf spark.ui.enabled=false --driver-memory 8g \
  scripts/bench_job.py "$ROOT" $NF $NO $NI $NIO none 1 >/dev/null 2>&1 || true

for phase in asof image dedup; do
  for cores in 8 32; do
    echo "== phase=$phase cores=$cores =="
    run $cores $phase | tee "BENCH/raw_${phase}_${cores}.json"
  done
done
python scripts/write_scaling_report.py
