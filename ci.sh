#!/usr/bin/env bash
# CI pipeline (mirrors the reference's .github/workflows/ci.yml:16-127:
# test, bench build, run example, lint).  Usage: ./ci.sh [fast|full]
set -euo pipefail
cd "$(dirname "$0")"

MODE="${1:-fast}"

echo "== unit + integration tests =="
if [ "$MODE" = "fast" ]; then
    python -m pytest tests/ -q -x -m "not slow"
else
    python -m pytest tests/ -q -x
fi

echo "== examples =="
python examples/simple_circuit.py
python examples/example_poly.py

echo "== bench compile check (tiny size, host backend) =="
BENCH_LOG2N=5 BENCH_BACKEND=host python bench.py

echo "== multichip dryrun (8-device virtual mesh) =="
python __graft_entry__.py

echo "CI OK"
