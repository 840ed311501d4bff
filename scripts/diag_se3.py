"""SE3 solver convergence diagnosis: f32 vs f64 state at growing N.

Round-4 differential test (VERDICT r3 #1): the SE3 bench records
chi2 5.9e6 vs the CPU f64 baseline's 2.02 on the 4k hdl graph. The SE2
failure with this signature (NOTES_r3 #1) was f32 pose state. This
script separates state-precision failure from solver-logic failure:
run the IDENTICAL optimize_se3 on f32 or f64 graph arrays on CPU and
compare chi2 trajectories. One dtype per process (x64 flag is global).

Usage:
    python scripts/diag_se3.py f32 1024 [max_iters]
    python scripts/diag_se3.py f64 1024 [max_iters]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# the session's 'axon' TPU plugin ignores JAX_PLATFORMS: force via config
jax.config.update("jax_platforms", "cpu")

DTYPE = sys.argv[1] if len(sys.argv) > 1 else "f32"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
MAX_ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20

if DTYPE == "f64":
    jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _build_bench_graph_se3  # noqa: E402
from delta_graph_slam_tpu.graph import (  # noqa: E402
    SolverConfig, optimize_se3,
)


def main():
    dtype = np.float64 if DTYPE == "f64" else np.float32
    b, gt = _build_bench_graph_se3(N)
    g = b.to_arrays(dtype=dtype)
    cfg = SolverConfig(backend="chain", max_iterations=MAX_ITERS)
    t0 = time.perf_counter()
    (poses, planes, points), stats = optimize_se3(g, level=0, config=cfg)
    dt = time.perf_counter() - t0
    poses = np.asarray(poses)
    ate = float(np.mean(np.linalg.norm(poses[:N, :3] - gt[:, :3], axis=1)))
    print(f"N={N:5d} chain {DTYPE:4s} "
          f"chi2 {float(stats.chi2_initial):.6g} -> "
          f"{float(stats.chi2_final):.6g} "
          f"iters {int(stats.iterations)} "
          f"lam {float(stats.lambda_final):.3g} "
          f"drop {int(stats.n_offchain_dropped)} ate {ate:.3f} "
          f"({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
