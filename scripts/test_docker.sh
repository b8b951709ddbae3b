#!/usr/bin/env bash
# Build the serving image and smoke-test it (counterpart of the
# reference scripts/test_docker.sh).
set -euo pipefail
docker image prune -f
docker build -t lightly-ocr-tpu .
docker run --rm -d -p 5000:5000 --name ocr-smoke lightly-ocr-tpu
trap 'docker rm -f ocr-smoke' EXIT
for _ in $(seq 30); do
  sleep 2
  if curl -fsS localhost:5000/ | grep -q online; then
    echo "server online"
    exit 0
  fi
done
echo "server did not come up" >&2
exit 1
