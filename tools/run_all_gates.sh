#!/bin/bash
# Round exit gate: unit+property+e2e tests, oracle gate (engine session and
# vanilla driver-like session), and the sf0.1 benchmark.
set -e
cd "$(dirname "$0")/.."
echo "=== pytest ==="
python -m pytest tests/ -q
echo "=== oracle gate (engine session) ==="
python tools/check_oracle.py
echo "=== oracle gate (vanilla session) ==="
python tools/check_oracle.py --vanilla
echo "=== bench sf0.1 ==="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} python bench.py
