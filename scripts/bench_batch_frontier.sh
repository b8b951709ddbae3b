#!/bin/bash
# Batch-size frontier (VERDICT r4 #2): does a larger dispatch amortize
# the per-dispatch host/RPC band (~56 ms measured by bench.py's diag
# block) better than depth-4 pipelining of b16 already does?
#
# Grid: batch x depth at roughly fixed in-flight receipts (~64-96),
# plus each batch at its throughput-optimal depth.  Every new batch
# shape pays one remote compile (~4-6 min on this tunnel; the shapes
# are AOT-cached afterward).  Also the recorded monolith-vs-split A/B
# (LIGHTLY_OCR_MONOLITH=0) at the default shape.
#
# Run: nohup bash scripts/bench_batch_frontier.sh > /tmp/frontier.log 2>&1 &
set -u
mkdir -p /tmp/bench_sweep
cd "$(dirname "$0")/.."
export LIGHTLY_OCR_BENCH_BUDGET_S=2100
run() {
  name=$1; shift
  echo "=== $name : $* ==="
  timeout 2400 env "${ENV_EXTRA:-LIGHTLY_OCR_NOOP=0}" \
      python bench.py "$@" \
      > /tmp/bench_sweep/$name.json 2> /tmp/bench_sweep/$name.err
  echo "--- $name stdout:"; cat /tmp/bench_sweep/$name.json
  echo "--- $name stderr tail:"
  grep -E "sub-window|p50|diag|budget" /tmp/bench_sweep/$name.err | tail -6
}
run b24_d3 --batch 24 --depth 3 --dispatches 64
run b24_d4 --batch 24 --depth 4 --dispatches 64
run b32_d2 --batch 32 --depth 2 --dispatches 48
run b32_d3 --batch 32 --depth 3 --dispatches 48
run b48_d2 --batch 48 --depth 2 --dispatches 32
ENV_EXTRA="LIGHTLY_OCR_MONOLITH=0" run b16_d4_split --dispatches 96
echo ALL DONE
