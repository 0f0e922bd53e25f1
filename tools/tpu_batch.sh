#!/bin/bash
# On-chip measurement batch: run when the TPU tunnel returns.
# Logs to /tmp/tpu_batch/. Each step is independently timeout-bounded.
set -u
OUT=/tmp/tpu_batch
mkdir -p $OUT
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 1800 "$@" > $OUT/$name.log 2>&1
  echo "--- $name exit=$? tail:"
  tail -4 $OUT/$name.log
}

run bench_headline python bench.py
run probe4_sched python tools/perf_probe4.py
run probe8_fused python tools/perf_probe8.py
run probe7_shading python tools/perf_probe7.py
run probe6_chunk18 python tools/perf_probe6.py --chunk-log2 18
run probe4_wide16 env TPURT_BVH_WIDTH=16 python tools/perf_probe4.py
run bench_configs python bench.py --no-rpf --configs 3,4,5
echo "=== batch done ==="
