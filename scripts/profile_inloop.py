#!/usr/bin/env python
"""True in-loop per-stage cost of the fused chain-LM iteration.

Wraps each stage composite in a jitted lax.fori_loop (data fed back so
nothing hoists/DCEs) and reports the marginal cost per iteration from
two loop lengths — the tunnel dispatch floor and compile time cancel
exactly, unlike per-dispatch timing (scripts/profile_chain_stages.py).

Usage: python scripts/profile_inloop.py [n_nodes] [K_cap]
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
from delta_graph_slam_tpu.graph.chain_lm import _linearize_full  # noqa: E402
from delta_graph_slam_tpu.graph.chain_solve import (  # noqa: E402
    bcr_apply_df, bcr_factor_df, chain_core_solve_df,
)
from delta_graph_slam_tpu.graph.df_linalg import DFM, dfm  # noqa: E402


def inloop_ms(label, make_body, init, n1=20, n2=60):
    """Marginal per-iteration ms of body via two fori_loop lengths."""
    times = {}
    for n in (n1, n2):
        f = jax.jit(lambda x0, n=n: jax.lax.fori_loop(0, n, make_body(), x0))
        out = f(init)
        jax.tree_util.tree_map(
            lambda l: l.block_until_ready(), jax.tree_util.tree_leaves(out))
        # sync via scalar fetch (block_until_ready is a no-op on axon)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(init)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    ms = (times[n2] - times[n1]) / (n2 - n1) * 1000
    print(f"{label:36s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main(n_nodes=4096, K_cap=None):
    b, gt = _build_bench_graph(n_nodes)
    g = b.to_arrays(chain_first=True)
    nc = g.poses.shape[0] - 1
    N = g.poses.shape[0]
    hint = b.count_offchain(0)
    cfg = SolverConfig(backend="chain")
    if K_cap is None:
        K_cap = 32 if hint <= 32 else 128
    print(f"--- {n_nodes} nodes, nc {nc}, off_hint {hint}, K_cap {K_cap} ---",
          flush=True)

    free = jnp.ones((N, 3), jnp.float32)
    free = free.at[0].set(0.0)
    vmask = np.zeros(N, bool)
    vmask[: n_nodes] = True
    free = free * jnp.asarray(vmask, jnp.float32)[:, None]
    free_v = jnp.any(free > 0, axis=1)
    state0 = DF(g.poses, jnp.zeros_like(g.poses))
    lam = jnp.asarray(1e-4, jnp.float32)

    # stage 1: linearize_full only
    def body_lin():
        def body(i, st):
            bundle, _ = _linearize_full(g, st, 0, nc, N, free_v)
            # feed chi2 back into the state so the loop is sequential
            return DF(st.hi + 1e-12 * bundle.chi2, st.lo)
        return body
    t_lin = inloop_ms("linearize_full", body_lin, state0)

    # precompute bundle + off table once (host) for solve-only loops
    bundle0, t_off0 = jax.jit(
        lambda: _linearize_full(g, state0, 0, nc, N, free_v))()
    order = jnp.argsort(~t_off0)[:K_cap]
    gate = t_off0[order][:, None, None].astype(jnp.float32)
    off = (bundle0.tail.i[order], bundle0.tail.j[order],
           bundle0.tail.Ji[order] * gate, bundle0.tail.Jj[order] * gate,
           bundle0.tail.W[order] * gate)
    eye = jnp.eye(3, dtype=jnp.float32)
    fm = free[:, :, None] * free[:, None, :]
    bm = free[:, :, None] * jnp.roll(free, 1, axis=0)[:, None, :]
    bm = bm.at[0].set(0.0)

    from delta_graph_slam_tpu.graph.df_linalg import df_add

    def assembled(lam_):
        diag_extra = (1.0 - fm) * eye[None] + lam_ * free[:, :, None] * eye[None]
        Ad = df_add(DFM(bundle0.A0.hi * fm, bundle0.A0.lo * fm),
                    dfm(diag_extra))
        Bd = DFM(bundle0.B0.hi * bm, bundle0.B0.lo * bm)
        return Ad, Bd

    # stage 2: factor only
    P = 1 << max(int(N - 1).bit_length(), 2)
    padA = jnp.broadcast_to(eye, (P - N, 3, 3))
    padZ = jnp.zeros((P - N, 3, 3), jnp.float32)

    def body_factor():
        def body(i, acc):
            Ad, Bd = assembled(lam + 1e-12 * acc)
            Adp = DFM(jnp.concatenate([Ad.hi, padA]),
                      jnp.concatenate([Ad.lo, padZ]))
            Bdp = DFM(jnp.concatenate([Bd.hi, padZ]),
                      jnp.concatenate([Bd.lo, padZ]))
            levels, base = bcr_factor_df(Adp, Bdp)
            return acc + base.hi[0, 0, 0]
        return body
    t_fac = inloop_ms("assemble+factor", body_factor,
                      jnp.asarray(0.0, jnp.float32))

    # stage 3: full solve (assemble + factor + joint apply + woodbury)
    def body_solve():
        def body(i, acc):
            Ad, Bd = assembled(lam + 1e-12 * acc)
            x = chain_core_solve_df(Ad, Bd, -bundle0.b, free, N, off=off)
            return acc + x[1, 0]
        return body
    t_sol = inloop_ms("assemble+full chain solve", body_solve,
                      jnp.asarray(0.0, jnp.float32))

    # stage 3b: solve without off-chain (width-1 apply)
    def body_solve_noff():
        def body(i, acc):
            Ad, Bd = assembled(lam + 1e-12 * acc)
            x = chain_core_solve_df(Ad, Bd, -bundle0.b, free, N, off=None)
            return acc + x[1, 0]
        return body
    t_sol0 = inloop_ms("assemble+solve (no off-chain)", body_solve_noff,
                       jnp.asarray(0.0, jnp.float32))

    # stage 4: spike local solve variants
    from delta_graph_slam_tpu.parallel.spike import (
        spike_core_solve_df, spike_local_solve_df,
    )

    for p, Lc in ((8, 16), (16, 16), (32, 16), (16, 32)):
        def body_spike(p=p, Lc=Lc):
            def body(i, acc):
                Ad, Bd = assembled(lam + 1e-12 * acc)
                x, _ = spike_local_solve_df(Ad, Bd, -bundle0.b, free, N,
                                            p=p, off=off, Lc=Lc)
                return acc + x[1, 0]
            return body
        inloop_ms(f"assemble+spike_local p{p} Lc{Lc}", body_spike,
                  jnp.asarray(0.0, jnp.float32), n1=10, n2=30)

    print("--- deltas ---")
    print(f"woodbury (off-chain width)          {t_sol - t_sol0:8.3f}")
    print(f"apply-1col+base                     {t_sol0 - t_fac:8.3f}")
    print(f"sum lin+solve                       {t_lin + t_sol:8.3f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    k = int(sys.argv[2]) if len(sys.argv) > 2 else None
    main(n, k)
