#!/usr/bin/env python
"""Marginal ms/iter of the REAL chain-LM driver via two iteration caps.

bench_pose_graph times (one dispatch of N iters)/N which folds in the
dispatch+fetch floor; comparing two caps cancels it and gives the true
in-loop cost of lm_se2_chain's lm_step (solve + trial linearize + carry).

Usage: python scripts/profile_lm_marginal.py [n_nodes] [backend]
"""
import dataclasses
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _build_bench_graph  # noqa: E402
from delta_graph_slam_tpu.graph import SolverConfig, optimize_se2  # noqa: E402


def run(n_nodes, backend="chain", caps=(10, 40)):
    b, gt = _build_bench_graph(n_nodes)
    g = b.to_arrays(chain_first=(backend == "chain"))
    nc = g.poses.shape[0] - 1 if backend == "chain" else 0
    hint = b.count_offchain(0)
    out = {}
    for cap in caps:
        cfg = SolverConfig(backend=backend, max_iterations=cap,
                           chi2_rel_tol=0.0, dx_tol=0.0)
        poses, stats = optimize_se2(g, level=0, config=cfg,
                                    off_hint=hint, n_chain=nc)
        float(stats.chi2_final)  # force + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            poses, stats = optimize_se2(g, level=0, config=cfg,
                                        off_hint=hint, n_chain=nc)
            it = int(stats.iterations)
            float(stats.chi2_final)
            best = min(best, time.perf_counter() - t0)
        out[cap] = (best, it)
        print(f"cap {cap}: {best*1000:.1f} ms total, {it} iters, "
              f"{best*1000/max(it,1):.2f} ms/iter naive", flush=True)
    (t1, i1), (t2, i2) = out[caps[0]], out[caps[1]]
    if i2 > i1:
        print(f"marginal: {(t2-t1)*1000/(i2-i1):.3f} ms/iter "
              f"(dispatch floor {t1 - (t2-t1)*i1/(i2-i1):.3f} s)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    be = sys.argv[2] if len(sys.argv) > 2 else "chain"
    run(n, be)
