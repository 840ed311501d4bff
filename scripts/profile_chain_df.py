#!/usr/bin/env python
"""Per-stage timing of the df chain LM at bench scale (TPU, warm).

Sync by fetching a scalar (block_until_ready is a no-op on axon)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _build_bench_graph  # noqa: E402
from delta_graph_slam_tpu.geom.dfloat import DF  # noqa: E402
from delta_graph_slam_tpu.graph import SolverConfig, optimize_se2  # noqa: E402
from delta_graph_slam_tpu.graph.chain_solve import (  # noqa: E402
    assemble_tridiag_df, bcr_factor_df, bcr_apply_df, chain_solve, _classify,
)
from delta_graph_slam_tpu.graph.lm_core import gradient  # noqa: E402
from delta_graph_slam_tpu.graph.solver import _free_mask, _linearize  # noqa: E402


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def timeit(label, fn, *args, n=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:38s} {dt:9.3f} ms", flush=True)
    return out


def main(n_nodes=4096, K_cap=32):
    b, gt = _build_bench_graph(n_nodes)
    g = b.to_arrays()
    N = g.poses.shape[0]
    hint = b.count_offchain(0)
    print(f"--- {n_nodes} nodes, {hint} loops, K_cap {K_cap} ---", flush=True)

    cfg = SolverConfig(backend="chain", max_iterations=40)
    poses, stats = optimize_se2(g, level=0, config=cfg, off_hint=hint)
    sync(poses)
    t0 = time.perf_counter()
    poses, stats = optimize_se2(g, level=0, config=cfg, off_hint=hint)
    sync(poses)
    dt = (time.perf_counter() - t0) * 1000
    iters = int(stats.iterations)
    print(f"{'full LM solve':38s} {dt:9.3f} ms  ({iters} it, "
          f"{dt / max(iters, 1):.3f} ms/it)", flush=True)

    state = DF(g.poses, jnp.zeros_like(g.poses))
    free = jax.jit(lambda gg: _free_mask(gg, 0))(g)
    lin = jax.jit(lambda gg, s: _linearize(gg, s, 0))
    sysm, _ = timeit("linearize", lin, g, state)
    bvec = timeit("gradient", jax.jit(gradient, static_argnums=1), sysm, N)

    lamj = jnp.asarray(1e-4, jnp.float32)
    free_v = jnp.any(free > 0, axis=1)
    chain_mask, _ = _classify(sysm, free_v)

    asm = jax.jit(lambda s, f, l: assemble_tridiag_df(s, N, f, l, chain_mask))
    AB = timeit("assemble_tridiag_df", asm, sysm, free, lamj)

    fact = jax.jit(lambda A, B: bcr_factor_df(A, B))
    factors = timeit("bcr_factor_df", fact, *AB)

    g1 = jnp.zeros((N, 3, 1), jnp.float32).at[:, 0, 0].set(1.0)
    app1 = jax.jit(lambda f, gg: bcr_apply_df(f, gg))
    timeit("bcr_apply_df 1 col", app1, factors, g1)
    gK = jnp.zeros((N, 3, K_cap * 3), jnp.float32) + 0.1
    timeit(f"bcr_apply_df {K_cap*3} cols", app1, factors, gK)

    cs = jax.jit(lambda s, bb, f, l: chain_solve(
        s, bb, f, l, N, K_cap=K_cap, base_blocks=16, refine_steps=0))
    timeit("chain_solve total", cs, sysm, bvec, free, lamj)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 32)
