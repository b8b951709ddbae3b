#!/bin/bash
# Sequential bench sweep (each distinct shape pays a multi-minute tunnel
# compile; run as one background job).  Logs land in /tmp/bench_sweep/.
set -u
mkdir -p /tmp/bench_sweep
cd "$(dirname "$0")/.."
run() {
  name=$1; shift
  echo "=== $name : $* ==="
  timeout 2400 python bench.py "$@" > /tmp/bench_sweep/$name.json 2> /tmp/bench_sweep/$name.err
  echo "--- $name stdout:"; cat /tmp/bench_sweep/$name.json
  echo "--- $name stderr tail:"; tail -3 /tmp/bench_sweep/$name.err
}
run tail_bf16 --bf16
run tail_int8 --int8
run g32_bf16 --granularity 32 --bf16
run g32_int8 --granularity 32 --int8
