#!/usr/bin/env bash
# CI entry (the reference's GitHub Actions matrix builds docker images and
# runs catkin_make, .github/workflows/build.yml; here CI = native build +
# the full test pyramid + a smoke replay).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C delta_graph_slam_tpu/native

echo "== unit + integration tests =="
python -m pytest tests/ -q

# NB: a full-capacity CLI smoke on CPU costs ~15 min of XLA compiles; the
# end-to-end coverage lives in tests/test_pipeline_e2e.py (scaled
# capacities). On a TPU host, add:
#   python -m delta_graph_slam_tpu.cli run --preset delta --synthetic 20 --eval

echo "CI OK"
