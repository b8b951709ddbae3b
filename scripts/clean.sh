#!/usr/bin/env bash
# Remove Python/Jupyter cache droppings (reference: scripts/clean.sh:1-3).
# Also clears pytest caches; committed .aotcache TPU executables are kept.
find . -type d \( -name __pycache__ -o -name .ipynb_checkpoints -o -name .pytest_cache \) -prune -exec rm -rf {} +
