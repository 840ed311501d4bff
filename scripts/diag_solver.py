#!/usr/bin/env python
"""Diagnose the 4k bench-graph solver quality gap (VERDICT r2 item 1).

Runs a trusted f64 sparse robust-LM (Huber IRLS + g2o lambda schedule,
SuperLU) on the identical bench graph and prints its chi2 trajectory and
ATE, next to the plain-GN (non-robust) baseline. This tells us where the
ROBUST optimum actually is, so the TPU chain solver can be asserted
against it.
"""
import sys
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spl

sys.path.insert(0, "/root/repo")
from bench import _build_bench_graph  # noqa: E402


def wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def linearize(x, ei, ej, meas, infos):
    E = len(ei)
    xi, xj = x[ei], x[ej]
    ci, si = np.cos(xi[:, 2]), np.sin(xi[:, 2])
    cm, sm = np.cos(meas[:, 2]), np.sin(meas[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    lx = ci * dx + si * dy
    ly = -si * dx + ci * dy
    ex = cm * (lx - meas[:, 0]) + sm * (ly - meas[:, 1])
    ey = -sm * (lx - meas[:, 0]) + cm * (ly - meas[:, 1])
    et = wrap(xj[:, 2] - xi[:, 2] - meas[:, 2])
    r = np.stack([ex, ey, et], 1)

    A = np.empty((E, 2, 2))
    A[:, 0, 0] = cm * ci - sm * si
    A[:, 0, 1] = cm * si + sm * ci
    A[:, 1, 0] = -sm * ci - cm * si
    A[:, 1, 1] = -sm * si + cm * ci
    dlx = -si * dx + ci * dy
    dly = -ci * dx - si * dy
    dthx = cm * dlx + sm * dly
    dthy = -sm * dlx + cm * dly
    Ji = np.zeros((E, 3, 3))
    Ji[:, :2, :2] = -A
    Ji[:, 0, 2] = dthx
    Ji[:, 1, 2] = dthy
    Ji[:, 2, 2] = -1.0
    Jj = np.zeros((E, 3, 3))
    Jj[:, :2, :2] = A
    Jj[:, 2, 2] = 1.0
    return r, Ji, Jj


def robust_chi2_weights(r, infos, huber_mask, delta):
    e2 = np.einsum("ea,eab,eb->e", r, infos, r)
    rho = np.where(
        huber_mask & (e2 > delta * delta),
        2.0 * delta * np.sqrt(np.maximum(e2, 1e-30)) - delta * delta,
        e2,
    )
    w = np.where(
        huber_mask & (e2 > delta * delta),
        delta / np.sqrt(np.maximum(e2, 1e-30)),
        1.0,
    )
    return rho.sum(), w


def solve_normal_eqs(x, ei, ej, meas, infos, w, lam, V):
    r, Ji, Jj = linearize(x, ei, ej, meas, infos)
    Wf = infos * w[:, None, None]
    JiT_W = np.einsum("eba,ebc->eac", Ji, Wf)
    JjT_W = np.einsum("eba,ebc->eac", Jj, Wf)
    Hii = JiT_W @ Ji
    Hij = JiT_W @ Jj
    Hjj = JjT_W @ Jj
    bi = np.einsum("eab,eb->ea", JiT_W, r)
    bj = np.einsum("eab,eb->ea", JjT_W, r)

    rows, cols, vals = [], [], []

    def blocks(bi_idx, bj_idx, M):
        rr = 3 * bi_idx[:, None, None] + np.arange(3)[None, :, None]
        cc = 3 * bj_idx[:, None, None] + np.arange(3)[None, None, :]
        rows.append(np.broadcast_to(rr, M.shape).ravel())
        cols.append(np.broadcast_to(cc, M.shape).ravel())
        vals.append(M.ravel())

    blocks(ei, ei, Hii)
    blocks(ei, ej, Hij)
    blocks(ej, ei, Hij.transpose(0, 2, 1))
    blocks(ej, ej, Hjj)
    Hb = np.zeros(3 * V)
    np.add.at(Hb, (3 * ei[:, None] + np.arange(3)).ravel(), bi.ravel())
    np.add.at(Hb, (3 * ej[:, None] + np.arange(3)).ravel(), bj.ravel())
    H = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(3 * V, 3 * V),
    ).tocsc()
    H = H + sp.identity(3 * V, format="csc") * lam
    fix = sp.coo_matrix(
        (np.full(3, 1e12), (np.arange(3), np.arange(3))), shape=(3 * V, 3 * V)
    ).tocsc()
    delta = spl.splu(H + fix).solve(-Hb)
    return delta.reshape(V, 3), Hb


def run(n_nodes=4096, robust=True, max_iters=60, verbose=True):
    b, gt = _build_bench_graph(n_nodes)
    V = len(b.poses)
    x = np.asarray(b.poses, np.float64).copy()
    ei = np.asarray([e["i"] for e in b.edges if e["type"] == "se2"])
    ej = np.asarray([e["j"] for e in b.edges if e["type"] == "se2"])
    meas = np.asarray([e["meas"] for e in b.edges if e["type"] == "se2"], np.float64)
    infos = np.asarray([e["info"] for e in b.edges if e["type"] == "se2"], np.float64)
    kern = np.asarray(
        [e["kernel"] == 1 for e in b.edges if e["type"] == "se2"]
    )  # kernel_id("Huber") == 1
    delta_k = 1.0
    if not robust:
        kern = np.zeros_like(kern)

    r, _, _ = linearize(x, ei, ej, meas, infos)
    chi2, w = robust_chi2_weights(r, infos, kern, delta_k)
    chi2_0 = chi2
    # g2o initial lambda: tau * max diag(H)
    lam = 1e-5 * 400.0 * 2  # rough; refined by schedule
    nu = 2.0
    t0 = time.perf_counter()
    for it in range(max_iters):
        dx, grad = solve_normal_eqs(x, ei, ej, meas, infos, w, lam, V)
        xt = x + dx
        xt[:, 2] = wrap(xt[:, 2])
        rt, _, _ = linearize(xt, ei, ej, meas, infos)
        chi2_t, w_t = robust_chi2_weights(rt, infos, kern, delta_k)
        denom = np.sum(dx.reshape(-1) * (lam * dx.reshape(-1) - grad))
        rho_gain = (chi2 - chi2_t) / max(abs(denom), 1e-30)
        if chi2_t < chi2:
            x, chi2, w = xt, chi2_t, w_t
            lam *= max(1.0 / 3.0, 1.0 - (2 * rho_gain - 1) ** 3)
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
        if verbose and (it % 5 == 0 or it == max_iters - 1):
            ate = float(np.mean(np.linalg.norm(x[:, :2] - gt[:, :2], axis=1)))
            print(f"  it={it:3d} chi2={chi2:12.4f} lam={lam:9.2e} ate={ate:8.3f}")
    dt = time.perf_counter() - t0
    ate = float(np.mean(np.linalg.norm(x[:, :2] - gt[:, :2], axis=1)))
    return chi2_0, chi2, ate, dt / max_iters * 1000


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(f"=== trusted f64 robust (Huber) LM, {n} nodes ===")
    c0, c, ate, ms = run(n, robust=True)
    print(f"chi2 {c0:.2f} -> {c:.6f} ({c / max(c0, 1e-30):.2e}); "
          f"ATE {ate:.4f} m; {ms:.1f} ms/iter")
    print(f"=== trusted f64 NON-robust LM, {n} nodes ===")
    c0, c, ate, ms = run(n, robust=False)
    print(f"chi2 {c0:.2f} -> {c:.6f} ({c / max(c0, 1e-30):.2e}); "
          f"ATE {ate:.4f} m; {ms:.1f} ms/iter")
