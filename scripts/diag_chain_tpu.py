#!/usr/bin/env python
"""Probe TPU chain-LM tail convergence on the 4k bench graph."""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from bench import _build_bench_graph  # noqa: E402
from delta_graph_slam_tpu.graph import SolverConfig, optimize_se2  # noqa: E402


def main(n=4096):
    b, gt = _build_bench_graph(n)
    g = b.to_arrays()
    for iters, refine in [(30, 0), (60, 0), (30, 1), (60, 1), (90, 1)]:
        cfg = SolverConfig(backend="chain", max_iterations=iters,
                           chain_offrank_capacity=128,
                           chain_refine_steps=refine)
        poses, stats = optimize_se2(g, level=0, config=cfg)
        jax.block_until_ready(poses)
        t0 = time.perf_counter()
        poses, stats = optimize_se2(g, level=0, config=cfg)
        poses_np = np.asarray(poses)
        dt = time.perf_counter() - t0
        ate = float(np.mean(np.linalg.norm(poses_np[:n, :2] - gt[:, :2], axis=1)))
        print(f"iters={iters:3d} refine={refine} -> used={int(stats.iterations):3d} "
              f"chi2={float(stats.chi2_final):10.4f} ate={ate:8.3f} "
              f"lam={float(stats.lambda_final):.2e} {dt*1000/max(int(stats.iterations),1):.2f} ms/it")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
