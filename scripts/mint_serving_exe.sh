#!/usr/bin/env bash
# Mint + verify the serving AOT executable.
#
# MANDATORY LAST STEP after any edit to bench.py, serving/, models/,
# or ops/pallas_*.py: the AOT cache key embeds the full lowered
# StableHLO *including Mosaic source locations of the calling stack*
# (utils/aotcache.py docstring), so even a comment edit on the trace
# path re-keys the program.  Without a fresh committed .jexe the
# driver's bench pays a 10-40 min remote cold compile every round.
#
# What it does:
#   1. cold run  — `python bench.py` compiles + stores on a cache miss
#                  (or loads warm if the entry already matches HEAD);
#   2. warm run  — MUST log "aotcache hit"; fails loudly otherwise;
#   3. prints the entry filename to `git add` and reminds you to drop
#      stale entries for superseded graphs.
#
# Usage: scripts/mint_serving_exe.sh [bench.py args...]
# (run on the TPU box; bench defaults mint the driver's exact program)
set -euo pipefail
cd "$(dirname "$0")/.."

log_cold=$(mktemp /tmp/mint_cold.XXXXXX.log)
log_warm=$(mktemp /tmp/mint_warm.XXXXXX.log)

echo "=== mint: run 1 (compiles + stores on cache miss) ===" >&2
LIGHTLY_OCR_LOGLEVEL=INFO python bench.py "$@" 2> >(tee "$log_cold" >&2)

echo "=== verify: run 2 must hit the AOT cache ===" >&2
t0=$(date +%s)
LIGHTLY_OCR_LOGLEVEL=INFO python bench.py "$@" 2> >(tee "$log_warm" >&2)
t1=$(date +%s)

if ! grep -q "aotcache hit" "$log_warm"; then
    echo "FAIL: the warm run did not hit the AOT cache — the key is" >&2
    echo "unstable (did an env var or arg differ between runs?)" >&2
    exit 1
fi
echo "OK: warm run hit the cache in $((t1 - t0))s" >&2

entry=$(grep -o "aotcache \(stored\|hit\) [^ ]*\.jexe" "$log_cold" "$log_warm" \
        | awk '{print $3}' | sort -u | tail -1)
if [ -n "$entry" ]; then
    echo "Entry: .aotcache/$entry" >&2
    echo "Next:  git add .aotcache/$entry && git commit" >&2
    echo "       (and git rm stale .aotcache/*.jexe of superseded graphs:" >&2
    echo "        any tpu entry not named above is dead weight)" >&2
fi

# Record the trace-path manifest so tests/test_aot_manifest.py turns the
# suite red if any later commit edits the trace path without re-minting
# (the round-4 official-number regression mode).
python scripts/aot_manifest.py write >&2
echo "Also:  git add .aotcache/MANIFEST.json" >&2
rm -f "$log_cold" "$log_warm"
