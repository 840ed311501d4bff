"""Sharded direct pose-graph solve: SPIKE substructuring over the mesh.

The single-chip chain solver (graph/chain_solve.py) eliminates the whole
odometry chain with one block-cyclic reduction — its levels are
sequential in N, so GSPMD cannot usefully shard it. This module uses the
classic substructuring decomposition instead (SPIKE / Wang's partition
method, re-derived for the df BCR kernel):

    T = D + U Wr U^T
    D  = blockdiag(T_1 .. T_p)   (p contiguous segments of the chain)
    U  = indicator columns at the 2(p-1) interface rows   (exact 0/1)
    Wr = blockdiag over interfaces of [[0, B^T], [B, 0]]  (df blocks)

Each segment's T_s factors with the df BCR *locally* — a batch of p
independent factorizations that shards over the mesh with ZERO
communication (the p axis is the mesh axis; each device owns N/p chain
blocks). Interfaces and loop closures are absorbed by one joint Woodbury
capacitance of size (2(p-1) + K_loops)·D:

    T^{-1} g = u - V (I + W C V)^{-1} W C u,   u, V = D^{-1} [g | U | C_l^T]

whose only communication is the gather of V's rows at the interface/loop
endpoint rows (a (K, D, K·D) all-gather) and the replicated small
capacitance solve. The interface blocks B stay DOUBLE-FLOAT end to end
(they are rows of the df-assembled tridiagonal; collapsing them to f32
would perturb T by ~1e-7 relative, which the chain's kappa ~ N^2
amplifies to an O(1) solve error — the same failure mode the df
elimination exists to fix).

The result is numerically identical to the single-chip chain solve (same
algebra, same precision) — unlike the CG backend, which was measured to
leave 85% step error on ill-conditioned graphs (VERDICT r2 #3/#5). This
is the long-context scaling axis of SURVEY.md §5 / BASELINE config 5:
10k+-node graphs solved over the ICI mesh.

Replaces: g2o lm_var_cholmod (launch/delta_graph_slam.launch:81) — the
reference has no distributed solver at all (SURVEY §2.b).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..graph.df_linalg import (
    DFM, df_add, df_bmm, df_matmul, dfm,
)
from ..graph.chain_solve import (
    _inv_dense, bcr_apply_df, bcr_factor_df, bmv, bmm,
)


def _pad_pow2_segments(Ad, Bd, b, free, N, p):
    """Pad to p segments of power-of-two length m (identity diagonal,
    zero coupling, zero RHS — exact no-ops)."""
    D = b.shape[1]
    dtype = b.dtype
    m = -(-N // p)                       # ceil
    m = 1 << max(m - 1, 1).bit_length() if m & (m - 1) else m
    P = p * m
    if P > N:
        padA = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (P - N, D, D))
        padZ = jnp.zeros((P - N, D, D), dtype)
        Ad = DFM(jnp.concatenate([Ad.hi, padA]),
                 jnp.concatenate([Ad.lo, padZ]))
        Bd = DFM(jnp.concatenate([Bd.hi, padZ]),
                 jnp.concatenate([Bd.lo, padZ]))
        b = jnp.concatenate([b, jnp.zeros((P - N, D), dtype)])
        free = jnp.concatenate([free, jnp.zeros((P - N, D), dtype)])
    return Ad, Bd, b, free, m, P


def spike_core_solve_df(Ad, Bd, b, free, N, p, off=None, mesh_axis=None):
    """Solve T x = b with T split into p chain segments.

    Ad, Bd: DFM (N,D,D) assembled tridiagonal (fixed-dim identities and
    damping applied, B[0] = 0). off: optional loop-closure table
    (ei, ej, Ji, Jj, W) as in chain_core_solve_df. mesh_axis: name of
    the mesh axis to shard the segment dimension over (None = run
    unsharded; the math is identical either way).

    Returns x (N,D) f32.
    """
    D = b.shape[1]
    dtype = b.dtype
    Ad, Bd, bp, freep, m, P = _pad_pow2_segments(Ad, Bd, b, free, N, p)

    # interface rows: a_t = t*m - 1, b_t = t*m   (t = 1..p-1)
    t_idx = jnp.arange(1, p) * m
    B_if = DFM(Bd.hi[t_idx], Bd.lo[t_idx])       # (p-1, D, D) df blocks

    def seg(X):
        return DFM(X.hi.reshape(p, m, D, D), X.lo.reshape(p, m, D, D))

    A_seg = seg(Ad)
    B_seg = seg(Bd)
    # cut the chain at segment boundaries (the interfaces move to Wr)
    B_seg = DFM(B_seg.hi.at[:, 0].set(0.0), B_seg.lo.at[:, 0].set(0.0))

    def shard_p(x):
        if mesh_axis is None:
            return x
        from jax.sharding import PartitionSpec as PS

        spec = PS(*((mesh_axis,) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, spec)

    A_seg = DFM(shard_p(A_seg.hi), shard_p(A_seg.lo))
    B_seg = DFM(shard_p(B_seg.hi), shard_p(B_seg.lo))

    factors = jax.vmap(bcr_factor_df)(A_seg, B_seg)

    # RHS stack: [b | U (interface indicators) | C_loops^T]
    n_if = 2 * (p - 1)
    K_l = 0 if off is None else off[0].shape[0]
    R = 1 + (n_if + K_l) * D

    rf = (bp * freep)[:, :, None]
    cols = [rf]
    if n_if:
        rows_if = jnp.stack([t_idx - 1, t_idx], axis=1).reshape(-1)  # (n_if,)
        U = jnp.zeros((P, D, n_if * D), dtype)
        eyeD = jnp.eye(D, dtype=dtype)
        col0 = jnp.arange(n_if) * D
        U = U.at[rows_if[:, None, None],
                 jnp.arange(D)[None, :, None],
                 (col0[:, None, None] + jnp.arange(D)[None, None, :])
                 ].set(jnp.broadcast_to(eyeD, (n_if, D, D)))
        # interfaces touch only free rows in a live graph; masked rows of
        # a padded tail never host an interface of an active segment
        cols.append(U * freep[:, :, None])
    if K_l:
        ei, ej, Ji, Jj, W = off
        eyeK = jnp.eye(K_l * D, dtype=dtype).reshape(K_l, D, K_l * D)
        Ct = jax.ops.segment_sum(
            bmm(jnp.swapaxes(Ji, 1, 2), eyeK), ei, num_segments=P
        )
        Ct = Ct + jax.ops.segment_sum(
            bmm(jnp.swapaxes(Jj, 1, 2), eyeK), ej, num_segments=P
        )
        cols.append(Ct * freep[:, :, None])
    rhs = jnp.concatenate(cols, axis=-1)         # (P, D, R)
    rhs_seg = shard_p(rhs.reshape(p, m, D, R))

    sol = jax.vmap(bcr_apply_df)(factors, rhs_seg)
    sol = DFM(sol.hi.reshape(P, D, R), sol.lo.reshape(P, D, R))

    ud = DFM(sol.hi[:, :, 0], sol.lo[:, :, 0])                 # (P,D)
    if n_if + K_l == 0:
        return ((ud.hi + ud.lo) * freep)[:N]
    Vd = DFM(sol.hi[:, :, 1:], sol.lo[:, :, 1:])               # (P,D,K*D)
    K = n_if + K_l

    # C V rows and C u values per capacitance "edge":
    #  - interface edge 2t   (row a_t):  C = E_a^T  -> V[a_t], u[a_t]
    #  - interface edge 2t+1 (row b_t):  C = E_b^T  -> V[b_t], u[b_t]
    #  - loop edge k: Ji V[ei_k] + Jj V[ej_k]
    cv_parts = []
    cu_parts = []
    if n_if:
        cv_parts.append(DFM(Vd.hi[rows_if], Vd.lo[rows_if]))
        cu_parts.append(DFM(ud.hi[rows_if, :, None], ud.lo[rows_if, :, None]))
    if K_l:
        cv_l = df_add(
            df_bmm(dfm(Ji), DFM(Vd.hi[ei], Vd.lo[ei])),
            df_bmm(dfm(Jj), DFM(Vd.hi[ej], Vd.lo[ej])),
        )
        cu_l = df_add(
            df_bmm(dfm(Ji), DFM(ud.hi[ei, :, None], ud.lo[ei, :, None])),
            df_bmm(dfm(Jj), DFM(ud.hi[ej, :, None], ud.lo[ej, :, None])),
        )
        cv_parts.append(cv_l)
        cu_parts.append(cu_l)
    CVd = DFM(jnp.concatenate([x.hi for x in cv_parts]),
              jnp.concatenate([x.lo for x in cv_parts]))       # (K,D,K*D)
    Cud = DFM(jnp.concatenate([x.hi for x in cu_parts]),
              jnp.concatenate([x.lo for x in cu_parts]))       # (K,D,1)

    # W application with the interface pair-swap: the Wr block of an
    # interface is [[0, B^T], [B, 0]], so edge 2t applies B^T to its
    # PARTNER'S (2t+1) C-row and vice versa; loop edges apply their own
    # (K_l f32) W. Interface B blocks stay df.
    if n_if:
        pair = jnp.arange(n_if).reshape(-1, 2)[:, ::-1].reshape(-1)
        CV_if = DFM(CVd.hi[:n_if][pair], CVd.lo[:n_if][pair])
        Cu_if = DFM(Cud.hi[:n_if][pair], Cud.lo[:n_if][pair])
        BT = DFM(jnp.swapaxes(B_if.hi, 1, 2), jnp.swapaxes(B_if.lo, 1, 2))
        # W blocks per interface edge: [B^T, B, B^T, B, ...]
        W_if = DFM(
            jnp.stack([BT.hi, B_if.hi], axis=1).reshape(n_if, D, D),
            jnp.stack([BT.lo, B_if.lo], axis=1).reshape(n_if, D, D),
        )
        WCV_if = df_bmm(W_if, CV_if)
        WCu_if = df_bmm(W_if, Cu_if)
    if K_l:
        Wd_l = dfm(W)
        WCV_l = df_bmm(Wd_l, DFM(CVd.hi[n_if:], CVd.lo[n_if:]))
        WCu_l = df_bmm(Wd_l, DFM(Cud.hi[n_if:], Cud.lo[n_if:]))
    if n_if and K_l:
        WCVd = DFM(jnp.concatenate([WCV_if.hi, WCV_l.hi]),
                   jnp.concatenate([WCV_if.lo, WCV_l.lo]))
        WCud = DFM(jnp.concatenate([WCu_if.hi, WCu_l.hi]),
                   jnp.concatenate([WCu_if.lo, WCu_l.lo]))
    elif n_if:
        WCVd, WCud = WCV_if, WCu_if
    else:
        WCVd, WCud = WCV_l, WCu_l

    eyeKD = jnp.eye(K * D, dtype=dtype)
    Mcap_d = df_add(
        dfm(eyeKD),
        DFM(WCVd.hi.reshape(K * D, K * D), WCVd.lo.reshape(K * D, K * D)),
    )
    Mcap_inv = _inv_dense(Mcap_d.hi)
    WCu = (WCud.hi + WCud.lo).reshape(K * D)
    y = Mcap_inv @ WCu
    for _ in range(2):
        My = df_matmul(Mcap_d, dfm(y[:, None]))
        ry = WCu - (My.hi + My.lo)[:, 0]
        y = y + Mcap_inv @ ry
    V2 = DFM(Vd.hi.reshape(P * D, K * D), Vd.lo.reshape(P * D, K * D))
    Vy = df_matmul(V2, dfm(y[:, None]))
    xh = ud.hi - Vy.hi.reshape(P, D)
    xl = ud.lo - Vy.lo.reshape(P, D)
    return ((xh + xl) * freep)[:N]
