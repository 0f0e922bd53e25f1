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
run probe_depth python tools/probe.py depth
run probe_fused python tools/probe.py fused
run probe_shading python tools/probe.py shading
run probe_driver18 python tools/probe.py driver --chunk-log2 18
run probe_rpf_filter python tools/probe.py rpf-filter
run bench_configs python bench.py --no-rpf --configs 3,4,5
echo "=== batch done ==="
