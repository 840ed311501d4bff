#!/usr/bin/env python
"""Per-iteration step-quality diagnostic: chain_solve dx vs exact f64 dx
on the same robust-weighted linearization, stepping the real LM state."""
import sys
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spl
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _build_bench_graph  # noqa: E402
from delta_graph_slam_tpu.geom.dfloat import DF  # noqa: E402
from delta_graph_slam_tpu.graph import SolverConfig  # noqa: E402
from delta_graph_slam_tpu.graph.chain_solve import chain_solve  # noqa: E402
from delta_graph_slam_tpu.graph.lm_core import gradient  # noqa: E402
from delta_graph_slam_tpu.graph.solver import (  # noqa: E402
    _chi2, _free_mask, _linearize,
)
from delta_graph_slam_tpu.geom.dfloat import df_add_small, df_normalize_angle  # noqa: E402


def exact_solve(sysm, bvec, free, lam, N):
    """f64 scipy solve of (H + lam I) dx = b from the device LinSys."""
    i = np.asarray(sysm.i)
    j = np.asarray(sysm.j)
    Ji = np.asarray(sysm.Ji, np.float64)
    Jj = np.asarray(sysm.Jj, np.float64)
    W = np.asarray(sysm.W, np.float64)
    fr = np.asarray(free, np.float64).reshape(-1)
    b = np.asarray(bvec, np.float64).reshape(-1) * fr
    JiT_W = np.einsum("eba,ebc->eac", Ji, W)
    JjT_W = np.einsum("eba,ebc->eac", Jj, W)
    rows, cols, vals = [], [], []
    a3 = np.arange(3)

    def blocks(bi, bj, M):
        rr = 3 * bi[:, None, None] + a3[None, :, None]
        cc = 3 * bj[:, None, None] + a3[None, None, :]
        rows.append(np.broadcast_to(rr, M.shape).ravel())
        cols.append(np.broadcast_to(cc, M.shape).ravel())
        vals.append(M.ravel())

    blocks(i, i, JiT_W @ Ji)
    blocks(i, j, JiT_W @ Jj)
    blocks(j, i, JjT_W @ Ji)
    blocks(j, j, JjT_W @ Jj)
    H = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(3 * N, 3 * N),
    ).tocsc()
    # free-mask projection + lam like the device path
    Dm = sp.diags(fr)
    H = Dm @ H @ Dm + sp.diags(np.where(fr > 0, lam, 1.0))
    return (spl.splu(H).solve(b) * fr).reshape(N, 3)


def main(n=4096, iters=12, K_cap=32, refine=0):
    b, gt = _build_bench_graph(n)
    g = b.to_arrays()
    N = g.poses.shape[0]
    state = DF(g.poses, jnp.zeros_like(g.poses))
    free = jax.jit(lambda gg: _free_mask(gg, 0))(g)

    lin = jax.jit(lambda gg, s: _linearize(gg, s, 0))
    grad = jax.jit(gradient, static_argnums=1)
    solve = jax.jit(
        lambda s, bb, f, l: chain_solve(s, bb, f, l, N, K_cap=K_cap,
                                        base_blocks=16,
                                        refine_steps=refine),
        static_argnames=(),
    )
    app = jax.jit(
        lambda s, dx: (lambda o: DF(
            o.hi.at[:, 2].set(df_normalize_angle(DF(o.hi[:, 2], o.lo[:, 2])).hi),
            o.lo.at[:, 2].set(df_normalize_angle(DF(o.hi[:, 2], o.lo[:, 2])).lo),
        ))(df_add_small(s, dx))
    )

    lam = 4e-3
    for it in range(iters):
        sysm, chi2 = lin(g, state)
        bvec = grad(sysm, N)
        dx, ndrop = solve(sysm, -bvec, free, jnp.asarray(lam, jnp.float32))
        dx_np = np.asarray(dx, np.float64)
        dx_ex = exact_solve(sysm, -bvec, free, lam, N)
        rel = np.linalg.norm(dx_np - dx_ex) / max(np.linalg.norm(dx_ex), 1e-30)
        # try the exact step too: which chi2 is better?
        st_chain = app(state, dx)
        st_exact = app(state, jnp.asarray(dx_ex, jnp.float32))
        _, c_chain = lin(g, st_chain)
        _, c_exact = lin(g, st_exact)
        print(f"it={it:2d} chi2={float(chi2):12.5f} |dx|={np.linalg.norm(dx_ex):9.4f} "
              f"step_rel_err={rel:9.2e} chi2_chain={float(c_chain):12.5f} "
              f"chi2_exact={float(c_exact):12.5f} drop={int(ndrop)}")
        # continue with the chain step (accept always, decrease lam)
        state = st_chain
        lam = max(lam / 3.0, 1e-8)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
