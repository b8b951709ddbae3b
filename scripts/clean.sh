#!/bin/bash
# Remove Python/pytest build droppings from the working tree.
# Parity surface for the reference's scripts/clean.sh (which xargs-rm'd
# pycache/ipynb-checkpoint hits); this version also clears pytest/ruff
# caches and never eval's find output.
set -euo pipefail
cd "$(dirname "$0")/.."
find . -type d \( -name __pycache__ -o -name .ipynb_checkpoints \
    -o -name .pytest_cache -o -name .ruff_cache \) -prune -exec rm -rf {} +
find . -type f \( -name '*.pyc' -o -name '*.pyo' \) -delete
echo "clean."
