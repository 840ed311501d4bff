"""Direct SE3 pose-graph solve: chain BCR + hub-vertex elimination.

The hdl/SE3 graph (models/hdl_backend.py) is an odometry chain of pose
vertices plus a handful of HUB vertices — floor plane(s), point
landmarks — that every keyframe may share an edge with (the reference
wires one EdgeSE3Plane per keyframe to a single g2o plane vertex,
/root/reference/apps floor-coeffs flush; graph types at
include/hdl_graph_slam/graph_slam.hpp:52-123). Edge-based Woodbury
(chain_solve.py) cannot absorb that: the hub collects one off-chain
edge per keyframe, so K grows with the trajectory.

The fix is to eliminate the hub VERTICES first. With the unified vertex
space ordered [poses 0..Vc-1 | hubs Vc..N-1], the damped Hessian is a
bordered block-arrow

    H = [[T,    Bc  ],      T   chain tridiagonal + pose-unary diags
         [Bc^T, A_hh]]      Bc  (Vc*D, nh*D) coupling, A_hh hub block

A_hh is tiny (nh*D square) and well-conditioned (thousands of edge
informations + lam on its diagonal), so x_h = A_hh^{-1}(b_h - Bc^T x_c)
is exact, and the reduced system

    (T + C^T W C - Bc A_hh^{-1} Bc^T) x_c = b_c - Bc A_hh^{-1} b_h

is the SAME chain + low-rank shape the SE2 solver already handles: the
hub coupling is just nh*D extra Woodbury columns with block weight
-A_hh^{-1}, joined with the off-chain loop edges in ONE generalized
capacitance

    x_c = u - V (I + Wt U V)^{-1} Wt U u,
    U = [C; Bc^T],  Wt = blockdiag(W_edges, -A_hh^{-1}),  V = T^{-1} U^T.

Everything runs in double-float (graph/df_linalg.py) for the same
kappa ~ N^2 reason as the SE2 chain (see chain_solve.py's module doc);
the 6x6 block inverses use the 2x2-blocked Schur form (df_inv6).

Replaces g2o lm_var_cholmod for the SE3/hdl capability set
(/root/reference/src/hdl_graph_slam/graph_slam.cpp:31-76, 338-352).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .chain_solve import (
    _inv_dense,
    _offchain_compact,
    bcr_apply_df,
    bcr_factor_df,
)
from .df_linalg import (
    DFM,
    df_add,
    df_bT,
    df_bmm,
    df_inv_dense,
    df_matmul,
    df_neg,
    df_segment_sum,
    dfm,
)
from .lm_core import LinSys, bmm


def _edge_hessians_df(sys: LinSys):
    """Per-edge df blocks (Hii, Hjj, Hij) = J^T W J products."""
    Jid, Jjd, Wd = dfm(sys.Ji), dfm(sys.Jj), dfm(sys.W)
    WJi = df_bmm(Wd, Jid)
    WJj = df_bmm(Wd, Jjd)
    JiT, JjT = df_bT(Jid), df_bT(Jjd)
    return df_bmm(JiT, WJi), df_bmm(JjT, WJj), df_bmm(JiT, WJj)


def _gate(X: DFM, g) -> DFM:
    m = g[:, None, None].astype(X.hi.dtype)
    return DFM(X.hi * m, X.lo * m)


def _dfcat(parts, axis=0) -> DFM:
    return DFM(jnp.concatenate([p.hi for p in parts], axis),
               jnp.concatenate([p.lo for p in parts], axis))


def _hub_classify(sys: LinSys, free, Vc):
    """Edge routing masks over the unified [poses | hubs] index space."""
    active = jnp.any(sys.W != 0, axis=(1, 2))
    free_v = jnp.any(free > 0, axis=1)
    hub_i = sys.i >= Vc
    hub_j = sys.j >= Vc
    pp = ~hub_i & ~hub_j
    off = (pp & (jnp.abs(sys.i - sys.j) > 1)
           & free_v[sys.i] & free_v[sys.j] & active)
    chain = pp & ~off
    xor = hub_i ^ hub_j
    # coupling edges that actually produce a nonzero Bc block (both
    # endpoints free + active); fixed-endpoint couplings degenerate to
    # pure diagonal contributions and must not consume capacity slots
    coup = xor & active & free_v[sys.i] & free_v[sys.j]
    hh = hub_i & hub_j
    return chain, off, xor, coup, hh, hub_i, hub_j


def hub_overflow(sys: LinSys, free, N, n_hub, K_cap, coup_cap):
    """Active off-chain + coupling edges beyond their capacities."""
    Vc = N - n_hub
    _, off, _, coup, _, _, _ = _hub_classify(sys, free, Vc)
    k_eff = min(int(K_cap), sys.i.shape[0])
    c_eff = min(int(coup_cap), sys.i.shape[0])
    d1 = jnp.maximum(jnp.sum(off).astype(jnp.int32) - k_eff, 0)
    d2 = jnp.maximum(jnp.sum(coup).astype(jnp.int32) - c_eff, 0)
    return (d1 + d2).astype(jnp.int32)


def _assemble_chain_df(Hii, Hjj, Hij, sys, Vc, free_c, lam, chain, xor,
                       hub_i, hub_j):
    """Chain tridiagonal over pose rows [0..Vc-1] (df).

    Diagonal blocks take every edge endpoint that lives on a pose and is
    not part of the Woodbury off set: chain edges contribute both ends,
    coupling edges their pose end (the hub end goes to A_hh)."""
    D = free_c.shape[1]
    dtype = free_c.dtype
    g_i = chain | (xor & ~hub_i)
    g_j = chain | (xor & ~hub_j)
    ii = jnp.clip(sys.i, 0, Vc - 1)
    jj = jnp.clip(sys.j, 0, Vc - 1)
    both = _dfcat([_gate(Hii, g_i), _gate(Hjj, g_j)])
    A = df_segment_sum(both, jnp.concatenate([ii, jj]), Vc)

    sub_ok = chain & (jnp.abs(sys.i - sys.j) == 1)
    HijT = df_bT(Hij)
    swap = (sys.j > sys.i)[:, None, None]
    val = _gate(DFM(jnp.where(swap, HijT.hi, Hij.hi),
                    jnp.where(swap, HijT.lo, Hij.lo)), sub_ok)
    B = df_segment_sum(val, jnp.clip(jnp.maximum(sys.i, sys.j), 0, Vc - 1),
                       Vc)

    eye = jnp.eye(D, dtype=dtype)
    fm = free_c[:, :, None] * free_c[:, None, :]
    extra = (1.0 - fm) * eye[None] + lam * free_c[:, :, None] * eye[None]
    A = df_add(DFM(A.hi * fm, A.lo * fm), dfm(extra))
    bm = free_c[:, :, None] * jnp.roll(free_c, 1, axis=0)[:, None, :]
    B = DFM((B.hi * bm).at[0].set(0.0), (B.lo * bm).at[0].set(0.0))
    return A, B


def _assemble_hub_df(Hii, Hjj, Hij, sys, Vc, n_hub, free_h, lam, xor, hh,
                     hub_i, hub_j):
    """Dense hub block A_hh (nh*D square, df), fixed dims -> identity."""
    D = Hii.hi.shape[-1]
    dtype = Hii.hi.dtype
    nh = n_hub
    il = jnp.clip(sys.i - Vc, 0, nh - 1)
    jl = jnp.clip(sys.j - Vc, 0, nh - 1)
    g_di = (xor | hh) & hub_i
    g_dj = (xor | hh) & hub_j & (sys.i != sys.j)   # unary hub edges: i == j
    g_off = hh & (sys.i != sys.j)
    HijT = df_bT(Hij)
    vals = _dfcat([
        _gate(Hii, g_di), _gate(Hjj, g_dj),
        _gate(Hij, g_off), _gate(HijT, g_off),
    ])
    ids = jnp.concatenate([il * nh + il, jl * nh + jl,
                           il * nh + jl, jl * nh + il])
    S = df_segment_sum(vals, ids, nh * nh)        # (nh*nh, D, D)

    def to_dense(x):
        return x.reshape(nh, nh, D, D).transpose(0, 2, 1, 3).reshape(
            nh * D, nh * D)

    A = DFM(to_dense(S.hi), to_dense(S.lo))
    Hd = nh * D
    eye = jnp.eye(Hd, dtype=dtype)
    fm = free_h[:, None] * free_h[None, :]
    extra = (1.0 - fm) * eye + lam * jnp.diag(free_h)
    return df_add(DFM(A.hi * fm, A.lo * fm), dfm(extra))


def _coupling_compact(Hij, sys, coup, Vc, nh, Ec_cap, free):
    """First Ec_cap coupling edges as (pose idx, hub local, Me) with Me
    the free-masked (pose-rows x hub-cols) df block; dead slots zero."""
    Ec_cap = min(int(Ec_cap), sys.i.shape[0])
    order = jnp.argsort(~coup)[:Ec_cap]
    live = coup[order]
    hub_is_i = sys.i[order] >= Vc
    p = jnp.clip(jnp.where(hub_is_i, sys.j[order], sys.i[order]), 0, Vc - 1)
    h = jnp.clip(jnp.where(hub_is_i, sys.i[order], sys.j[order]) - Vc,
                 0, nh - 1)
    Ho = DFM(Hij.hi[order], Hij.lo[order])
    HoT = df_bT(Ho)
    s = hub_is_i[:, None, None]
    Me = DFM(jnp.where(s, HoT.hi, Ho.hi), jnp.where(s, HoT.lo, Ho.lo))
    free_h = free[Vc:]                                     # (nh, D)
    m = (live[:, None, None].astype(free.dtype)
         * free[p][:, :, None] * free_h[h][:, None, :])
    Me = DFM(Me.hi * m, Me.lo * m)
    n_drop = jnp.sum(coup) - jnp.sum(live)
    return p, h, Me, n_drop.astype(jnp.int32)


@partial(jax.jit, static_argnames=("N", "n_hub", "K_cap", "coup_cap"))
def chain_hub_solve(sys: LinSys, b, free, lam, N, n_hub, K_cap=32,
                    coup_cap=4096):
    """Direct df solve of (H + lam I) x = b on a chain + hub graph.

    Vertex layout: [poses 0..N-n_hub-1 | hubs]. Returns (x (N,D),
    n_dropped) where n_dropped counts active off-chain loop edges beyond
    K_cap plus coupling edges beyond coup_cap (the caller should
    re-dispatch with bigger capacities — same contract as chain_solve).
    """
    with jax.default_matmul_precision("highest"):
        return _hub_impl(sys, b, free, lam, N, n_hub, K_cap, coup_cap)


def _hub_impl(sys, b, free, lam, N, n_hub, K_cap, coup_cap):
    D = b.shape[1]
    dtype = b.dtype
    Vc = N - n_hub
    nh = n_hub
    Hd = nh * D
    K_cap = min(int(K_cap), sys.i.shape[0])

    chain, off, xor, coup, hh, hub_i, hub_j = _hub_classify(sys, free, Vc)
    Hii, Hjj, Hij = _edge_hessians_df(sys)

    free_c = free[:Vc]
    free_h = free[Vc:].reshape(Hd)
    Ad, Bd = _assemble_chain_df(Hii, Hjj, Hij, sys, Vc, free_c, lam,
                                chain, xor, hub_i, hub_j)
    Ahh = _assemble_hub_df(Hii, Hjj, Hij, sys, Vc, nh, free_h, lam,
                           xor, hh, hub_i, hub_j)
    Ahh_inv = df_inv_dense(Ahh)

    pc, hc, Me, n_drop_c = _coupling_compact(Hij, sys, coup, Vc, nh,
                                             coup_cap, free)
    # dense coupling Bc (Vc, D, Hd) FROM the compacted set, so the
    # Woodbury columns and the elimination see the same operator even
    # under coup_cap overflow (dropped edges vanish consistently)
    Bc4 = df_segment_sum(Me, pc * nh + hc, Vc * nh)        # (Vc*nh, D, D)

    def to_bc(x):
        return x.reshape(Vc, nh, D, D).transpose(0, 2, 1, 3).reshape(
            Vc, D, Hd)

    Bc = DFM(to_bc(Bc4.hi), to_bc(Bc4.lo))

    bc = b[:Vc] * free_c
    bh = (b[Vc:] * free[Vc:]).reshape(Hd)

    # reduced RHS: b_c - Bc A_hh^{-1} b_h
    t = df_matmul(Ahh_inv, dfm(bh[:, None]))               # (Hd, 1)
    Bc2 = DFM(Bc.hi.reshape(Vc * D, Hd), Bc.lo.reshape(Vc * D, Hd))
    Bt = df_matmul(Bc2, t)                                 # (Vc*D, 1)
    b_red = df_add(dfm(bc), df_neg(DFM(Bt.hi.reshape(Vc, D),
                                       Bt.lo.reshape(Vc, D))))

    # off-chain loop edges -> Woodbury slots (pose-space indices)
    ei, ej, Ji, Jj, W, n_drop_k = _offchain_compact(sys, off, K_cap)
    K = K_cap
    eyeK = jnp.eye(K * D, dtype=dtype).reshape(K, D, K * D)
    Ct = jax.ops.segment_sum(
        bmm(jnp.swapaxes(Ji, 1, 2), eyeK), ei, num_segments=Vc)
    Ct = Ct + jax.ops.segment_sum(
        bmm(jnp.swapaxes(Jj, 1, 2), eyeK), ej, num_segments=Vc)
    Ct = Ct * free_c[:, :, None]

    # ONE joint BCR sweep over [b_red | C^T | Bc]
    P = 1 << max(int(Vc - 1).bit_length(), 2)
    R = 1 + K * D + Hd
    G = DFM(
        jnp.concatenate([b_red.hi[:, :, None], Ct, Bc.hi], axis=-1),
        jnp.concatenate([b_red.lo[:, :, None], jnp.zeros_like(Ct), Bc.lo],
                        axis=-1),
    )
    padA = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (P - Vc, D, D))
    padZ = jnp.zeros((P - Vc, D, D), dtype)
    AdP = DFM(jnp.concatenate([Ad.hi, padA]), jnp.concatenate([Ad.lo, padZ]))
    BdP = DFM(jnp.concatenate([Bd.hi, padZ]), jnp.concatenate([Bd.lo, padZ]))
    padG = jnp.zeros((P - Vc, D, R), dtype)
    GP = DFM(jnp.concatenate([G.hi, padG]), jnp.concatenate([G.lo, padG]))

    factors = bcr_factor_df(AdP, BdP)
    sol = bcr_apply_df(factors, GP)
    u = DFM(sol.hi[:Vc, :, 0], sol.lo[:Vc, :, 0])          # (Vc, D)
    Vt = DFM(sol.hi[:Vc, :, 1:], sol.lo[:Vc, :, 1:])       # (Vc, D, R-1)

    # generalized capacitance Mcap = I + Wt U V over [loops | hubs]
    CV = df_add(df_bmm(dfm(Ji), DFM(Vt.hi[ei], Vt.lo[ei])),
                df_bmm(dfm(Jj), DFM(Vt.hi[ej], Vt.lo[ej])))
    WCV = df_bmm(dfm(W), CV)                               # (K, D, R-1)
    MeT = df_bT(Me)
    BtV = df_bmm(MeT, DFM(Vt.hi[pc], Vt.lo[pc]))           # (Ec, D, R-1)
    BtV = df_segment_sum(BtV, hc, nh)                      # (nh, D, R-1)
    BtV2 = DFM(BtV.hi.reshape(Hd, R - 1), BtV.lo.reshape(Hd, R - 1))
    AiBtV = df_neg(df_matmul(Ahh_inv, BtV2))               # (Hd, R-1)
    rows = _dfcat([
        DFM(WCV.hi.reshape(K * D, R - 1), WCV.lo.reshape(K * D, R - 1)),
        AiBtV,
    ])
    Mcap = df_add(dfm(jnp.eye(R - 1, dtype=dtype)), rows)
    Mcap_inv = _inv_dense(Mcap.hi)

    # rhs_cap = Wt U u
    Cu = df_add(df_bmm(dfm(Ji), DFM(u.hi[ei, :, None], u.lo[ei, :, None])),
                df_bmm(dfm(Jj), DFM(u.hi[ej, :, None], u.lo[ej, :, None])))
    WCu = df_bmm(dfm(W), Cu)                               # (K, D, 1)
    Btu = df_bmm(MeT, DFM(u.hi[pc, :, None], u.lo[pc, :, None]))
    Btu = df_segment_sum(Btu, hc, nh)                      # (nh, D, 1)
    Btu2 = DFM(Btu.hi.reshape(Hd, 1), Btu.lo.reshape(Hd, 1))
    AiBtu = df_neg(df_matmul(Ahh_inv, Btu2))
    rhs = _dfcat([DFM(WCu.hi.reshape(K * D, 1), WCu.lo.reshape(K * D, 1)),
                  AiBtu])

    # f32-preconditioned df refinement of the capacitance solve (see
    # chain_solve's df branch for the kappa(Mcap) ~ 1/lambda analysis)
    rhs_v = (rhs.hi + rhs.lo)[:, 0]
    y = Mcap_inv @ rhs_v
    for _ in range(2):
        My = df_matmul(Mcap, dfm(y[:, None]))
        ry = rhs_v - (My.hi + My.lo)[:, 0]
        y = y + Mcap_inv @ ry

    # x_c = u - V y: both carry the chain's amplified global modes that
    # cancel here — keep the limbs until after the subtraction
    V2 = DFM(Vt.hi.reshape(Vc * D, R - 1), Vt.lo.reshape(Vc * D, R - 1))
    Vy = df_matmul(V2, dfm(y[:, None]))
    xc = DFM(u.hi - Vy.hi.reshape(Vc, D), u.lo - Vy.lo.reshape(Vc, D))

    # back-substitute hubs: x_h = A_hh^{-1} (b_h - Bc^T x_c)
    Btx = df_bmm(MeT, DFM(xc.hi[pc, :, None], xc.lo[pc, :, None]))
    Btx = df_segment_sum(Btx, hc, nh)
    Btx2 = DFM(Btx.hi.reshape(Hd, 1), Btx.lo.reshape(Hd, 1))
    th = df_add(dfm(bh[:, None]), df_neg(Btx2))
    xh = df_matmul(Ahh_inv, th)                            # (Hd, 1)

    x = jnp.concatenate([
        (xc.hi + xc.lo),
        (xh.hi + xh.lo).reshape(nh, D),
    ]) * free
    return x, (n_drop_k + n_drop_c).astype(jnp.int32)
