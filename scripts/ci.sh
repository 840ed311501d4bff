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
T0=$(date +%s)

echo "== native build =="
make -C delta_graph_slam_tpu/native

echo "== unit + integration tests ($MODE) =="
if [ "$MODE" = "full" ]; then
    python -m pytest tests/ -q
else
    python -m pytest tests/ -q -m "not slow"
fi

if [ "$MODE" = "fast" ]; then
    # enforce the gate's own contract (pytest.ini): <5 min wall clock.
    # The df-solver programs compile for minutes on a 1-core host; the
    # persistent XLA compilation cache (tests/conftest.py, persisted by
    # .github/workflows/ci.yml) keeps warm runs inside the budget — a
    # cold cache is reported but not failed (first run of a fresh host).
    ELAPSED=$(( $(date +%s) - T0 ))
    echo "fast gate wall clock: ${ELAPSED}s (budget 300s)"
    if [ "$ELAPSED" -gt 300 ]; then
        if [ -n "${DGS_CI_COLD_OK:-}" ]; then
            echo "over budget but DGS_CI_COLD_OK set (cold compile cache)"
        else
            echo "FAST GATE OVER BUDGET (${ELAPSED}s > 300s)" >&2
            exit 1
        fi
    fi
fi

# NB: a full-capacity CLI smoke on CPU costs ~15 min of XLA compiles; the
# end-to-end coverage lives in tests/test_pipeline_e2e.py (scaled
# capacities). On a TPU host, add:
#   python -m delta_graph_slam_tpu.cli run --preset delta --synthetic 20 --eval

echo "CI OK ($MODE)"
