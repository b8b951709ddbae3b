#!/usr/bin/env bash
# The CI test gate — the exact commands both CI configs
# (.circleci/config.yml, .github/workflows/ci.yml) run, kept in one
# executable script so the gate can be exercised locally byte-for-byte:
#
#     scripts/ci_test.sh          # fast suite (~6 min)
#     scripts/ci_test.sh --slow   # + the slow group (training/export/
#                                 #   multichip on the virtual 8-device
#                                 #   CPU mesh, ~1 h)
#
# (The reference's CircleCI ran NO tests — its only job built and
# pushed a Docker image on master, /root/reference/.circleci/config.yml
# :22-35.  This gate is what that pipeline was missing.)
set -euo pipefail
cd "$(dirname "$0")/.."

make -C native

python -m pytest tests/ -q -x

if [ "${1:-}" = "--slow" ]; then
    python -m pytest tests/ -q -m slow
fi
