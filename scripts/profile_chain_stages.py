#!/usr/bin/env python
"""In-program per-stage cost of one df chain LM iteration.

Each timing target is a SINGLE jitted composite (prefix of the
iteration pipeline); differencing consecutive prefixes cancels the
~2.6 ms per-dispatch floor of the tunnel. Sync = fetch one scalar.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _build_bench_graph  # noqa: E402
from delta_graph_slam_tpu.geom.dfloat import DF  # noqa: E402
from delta_graph_slam_tpu.graph import SolverConfig  # noqa: E402
from delta_graph_slam_tpu.graph.chain_solve import (  # noqa: E402
    _classify, assemble_tridiag_df, bcr_factor_df, bcr_apply_df, chain_solve,
)
from delta_graph_slam_tpu.graph.lm_core import gradient  # noqa: E402
from delta_graph_slam_tpu.graph.solver import _free_mask, _linearize  # noqa: E402


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def timeit(label, fn, *args, n=30):
    out = fn(*args)          # compile
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    print(f"{label:34s} {best:8.3f} ms", flush=True)
    return best


def main(n_nodes=4096, K_cap=32):
    b, gt = _build_bench_graph(n_nodes)
    g = b.to_arrays()
    N = g.poses.shape[0]
    print(f"--- {n_nodes} nodes, edge cap {g.edges.i.shape[0]}, "
          f"K_cap {K_cap} ---", flush=True)
    state = DF(g.poses, jnp.zeros_like(g.poses))
    free = jax.jit(lambda gg: _free_mask(gg, 0))(g)
    lam = jnp.asarray(1e-4, jnp.float32)

    def p_lin(gg, s):
        sysm, chi2 = _linearize(gg, s, 0)
        return sysm

    def p_grad(gg, s):
        sysm = p_lin(gg, s)
        return sysm, gradient(sysm, N)

    def p_asm(gg, s, f, l):
        sysm, bvec = p_grad(gg, s)
        free_v = jnp.any(f > 0, axis=1)
        cm, _ = _classify(sysm, free_v)
        return assemble_tridiag_df(sysm, N, f, l, cm), bvec

    def p_fact(gg, s, f, l):
        (A, B), bvec = p_asm(gg, s, f, l)
        D = 3
        P = 1 << max(int(N - 1).bit_length(), 4)
        import delta_graph_slam_tpu.graph.df_linalg as dfl
        padA = jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32), (P - N, D, D))
        padZ = jnp.zeros((P - N, D, D), jnp.float32)
        A = dfl.DFM(jnp.concatenate([A.hi, padA]), jnp.concatenate([A.lo, padZ]))
        B = dfl.DFM(jnp.concatenate([B.hi, padZ]), jnp.concatenate([B.lo, padZ]))
        return bcr_factor_df(A, B), bvec

    def p_apply1(gg, s, f, l):
        factors, bvec = p_fact(gg, s, f, l)
        P = factors[0][0][0].hi.shape[0] * 2 if factors[0] else 1
        D = 3
        rhs = jnp.zeros((1 << int(N - 1).bit_length(), D, 1), jnp.float32)
        rhs = rhs.at[:N, :, 0].set(bvec * f)
        return bcr_apply_df(factors, rhs)

    def p_full(gg, s, f, l):
        sysm, bvec = p_grad(gg, s)
        return chain_solve(sysm, -bvec, f, l, N, K_cap=K_cap,
                           base_blocks=16, refine_steps=0)

    t_lin = timeit("linearize", jax.jit(p_lin), g, state)
    t_grad = timeit("linearize+gradient", jax.jit(p_grad), g, state)
    t_asm = timeit("...+assemble_df", jax.jit(p_asm), g, state, free, lam)
    t_fact = timeit("...+factor_df", jax.jit(p_fact), g, state, free, lam)
    t_ap = timeit("...+apply 1col", jax.jit(p_apply1), g, state, free, lam)
    t_full = timeit("lin+grad+chain_solve (full)", jax.jit(p_full),
                    g, state, free, lam)
    print("--- in-program deltas ---")
    print(f"gradient        {t_grad - t_lin:8.3f} ms")
    print(f"assemble_df     {t_asm - t_grad:8.3f} ms")
    print(f"factor_df       {t_fact - t_asm:8.3f} ms")
    print(f"apply_1col      {t_ap - t_fact:8.3f} ms")
    print(f"woodbury+rest   {t_full - t_ap - (t_asm - t_grad) * 0:8.3f} "
          f"(full - apply1 prefix)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         int(sys.argv[2]) if len(sys.argv) > 2 else 32)
