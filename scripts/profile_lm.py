#!/usr/bin/env python
"""Split the pose-graph LM ms/iter into its parts on the live backend.

Times (scalar-fetch sync, warm):
  - one full optimize_se2 solve (as bench.py does)
  - linearize-only program
  - CG solve at several fixed iteration budgets
  - a single H matvec

    PYTHONPATH=/root/.axon_site python scripts/profile_lm.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _build_bench_graph  # noqa: E402
from delta_graph_slam_tpu.graph import SolverConfig, optimize_se2  # noqa: E402
from delta_graph_slam_tpu.graph.lm_core import (  # noqa: E402
    block_jacobi_inverse, cg_solve, diag_blocks, gradient, matvec,
)
from delta_graph_slam_tpu.graph.solver import _free_mask, _linearize  # noqa: E402


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(label, fn, *args, n=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:40s} {dt:9.3f} ms")
    return out


def main():
    print("platform:", jax.devices()[0].platform)
    for n_nodes in (4096, 16384):
        print(f"--- {n_nodes} nodes ---")
        b, gt = _build_bench_graph(n_nodes)
        g = jax.device_put(b.to_arrays())
        cfg = SolverConfig(backend="cg", max_iterations=30)

        poses, stats = optimize_se2(g, level=0, config=cfg)
        sync(poses)
        t0 = time.perf_counter()
        poses, stats = optimize_se2(g, level=0, config=cfg)
        sync(poses)
        dt = (time.perf_counter() - t0) * 1000
        iters = int(stats.iterations)
        print(f"{'full solve':40s} {dt:9.3f} ms   ({iters} LM iters, "
              f"{dt / max(iters, 1):.3f} ms/iter)")

        lin = jax.jit(lambda gg, p: _linearize(gg, p, 0)[0])
        sys0 = timeit("linearize", lin, g, g.poses)

        free = jax.jit(lambda gg: _free_mask(gg, 0))(g)
        lam = jnp.asarray(1e-4, g.poses.dtype)
        bvec = jax.jit(gradient, static_argnums=1)(sys0, n_nodes)
        Db = jax.jit(diag_blocks, static_argnums=1)(sys0, n_nodes)
        Minv = jax.jit(block_jacobi_inverse)(Db, free, lam)

        timeit("matvec x1", jax.jit(matvec), sys0, bvec, free, lam)
        for iters_cg in (10, 25, 50):
            fn = jax.jit(
                lambda s, bb, f, l, m, it=iters_cg: cg_solve(
                    s, bb, f, l, m, it, 0.0
                )
            )
            timeit(f"cg_solve {iters_cg} iters (no rtol exit)",
                   fn, sys0, bvec, free, lam, Minv)


if __name__ == "__main__":
    main()
