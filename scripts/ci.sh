#!/usr/bin/env bash
# CI entry (the reference's GitHub Actions matrix builds docker images and
# runs catkin_make, .github/workflows/build.yml; here CI = native build +
# the fast test pyramid + a smoke replay).
#
#   scripts/ci.sh        fast gate (<5 min): build + tests minus @slow
#   scripts/ci.sh full   everything (the pre-merge / nightly run)
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-fast}"

echo "== native build =="
make -C delta_graph_slam_tpu/native

echo "== unit + integration tests ($MODE) =="
if [ "$MODE" = "full" ]; then
    python -m pytest tests/ -q
else
    python -m pytest tests/ -q -m "not slow"
fi

# NB: a full-capacity CLI smoke on CPU costs ~15 min of XLA compiles; the
# end-to-end coverage lives in tests/test_pipeline_e2e.py (scaled
# capacities). On a TPU host, add:
#   python -m delta_graph_slam_tpu.cli run --preset delta --synthetic 20 --eval

echo "CI OK ($MODE)"
