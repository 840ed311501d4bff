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


def _df_sl(X: DFM, s) -> DFM:
    return DFM(X.hi[s], X.lo[s])


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


# --------------------------------------------------------------------------
# Locality-aware variant: per-segment column packing.
#
# spike_core_solve_df sweeps EVERY segment's BCR factor over the full
# [b | U | C^T] RHS — 1 + (2(p-1) + K)*D columns — although a loop
# closure's C^T column is nonzero only inside the (at most two) segments
# hosting its endpoints. At production sizes that wide double-float apply
# dominates the whole LM iteration (measured: the K=96 Woodbury sweep is
# most of the 16k-node iteration cost).
#
# spike_local_solve_df packs each segment's live columns into Lc local
# slots: segment s sweeps [b | left-interface | right-interface | its own
# endpoint slots] — 1 + (2 + Lc)*D columns, with Lc ~ 2K/p instead of
# n_if + K. The Woodbury algebra is unchanged (same capacitance over
# interfaces + loop edges); only the zero columns are never materialized.
# --------------------------------------------------------------------------


def _pack_endpoint_slots(ei, ej, live, m, p, Lc):
    """Assign the 2K off-chain endpoint entries to per-segment slots.

    Entry e in [0, 2K): endpoint i of edge e (e < K) or endpoint j of
    edge e - K. Returns (table (p, Lc) int32 entry-or-minus-1,
    edge_dropped (K,) bool). An edge is dropped (and must be zero-
    weighted by the caller) when EITHER endpoint overflows its segment's
    Lc slots — dropping one endpoint alone would solve an inconsistent
    system, dropping the whole edge solves the graph without that loop
    (the same graceful degradation as the K_cap overflow)."""
    K = ei.shape[0]
    rows = jnp.concatenate([ei, ej]).astype(jnp.int32)
    live2 = jnp.concatenate([live, live])
    seg = jnp.where(live2, rows // m, p)
    order = jnp.argsort(seg, stable=True).astype(jnp.int32)
    seg_s = seg[order]
    idx = jnp.arange(2 * K, dtype=jnp.int32)
    first = jnp.searchsorted(seg_s, seg_s, side="left").astype(jnp.int32)
    rank = idx - first
    ok = (rank < Lc) & (seg_s < p)
    slot = jnp.where(ok, seg_s * Lc + rank, p * Lc)
    table = jnp.full((p * Lc + 1,), -1, jnp.int32).at[slot].set(order)
    table = table[: p * Lc].reshape(p, Lc)

    ent_dropped = jnp.zeros((2 * K,), bool).at[order].set(
        (~ok) & (seg_s < p)
    )
    edge_dropped = ent_dropped[:K] | ent_dropped[K:]
    return table, edge_dropped


def spike_local_dropped(ei, ej, live, N, p, Lc):
    """Edges the locality-aware solve will drop for (N, p, Lc) — the
    packing depends only on the off-chain SET (robust weights never zero
    an active edge), so callers can hoist this out of the LM loop and
    surface it in SolverStats (ADVICE r2: overflow must be visible)."""
    m = -(-N // p)
    m = 1 << max(m - 1, 1).bit_length() if m & (m - 1) else m
    _, edge_dropped = _pack_endpoint_slots(
        ei.astype(jnp.int32), ej.astype(jnp.int32), live, m, p, Lc
    )
    return jnp.sum(edge_dropped).astype(jnp.int32)


def spike_local_solve_df(Ad, Bd, b, free, N, p, off, Lc, mesh_axis=None):
    """Solve T x = b like spike_core_solve_df, sweeping only local columns.

    off = (ei, ej, Ji, Jj, W) REQUIRED (use spike_core_solve_df / the
    plain chain solve when there are no off-chain edges). Lc: per-segment
    endpoint-slot capacity (static). Returns (x (N,D) f32,
    n_edges_dropped) — edges whose endpoints overflow Lc are excluded
    from the correction (their W is zeroed), mirroring the K_cap
    overflow contract.
    """
    D = b.shape[1]
    dtype = b.dtype
    ei, ej, Ji, Jj, W = off
    K = ei.shape[0]
    Ad, Bd, bp, freep, m, P = _pad_pow2_segments(Ad, Bd, b, free, N, p)

    t_idx = jnp.arange(1, p) * m
    B_if = _df_sl(Bd, t_idx)                      # (p-1, D, D) df blocks

    def seg4(X):
        return DFM(X.hi.reshape(p, m, D, D), X.lo.reshape(p, m, D, D))

    A_seg = seg4(Ad)
    B_seg = seg4(Bd)
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

    # ---- pack the endpoint slots ---------------------------------------
    live = jnp.any(W != 0, axis=(1, 2))
    table, edge_dropped = _pack_endpoint_slots(ei, ej, live, m, p, Lc)
    n_dropped = jnp.sum(edge_dropped).astype(jnp.int32)
    W_eff = W * (~edge_dropped)[:, None, None].astype(dtype)

    valid = table >= 0                             # (p, Lc)
    entry = jnp.where(valid, table, 0)
    e_idx = entry % K
    side_j = entry >= K
    grow = jnp.where(side_j, ej[e_idx], ei[e_idx]).astype(jnp.int32)
    lrow = jnp.where(valid, grow % m, 0)
    JiT = jnp.swapaxes(Ji, 1, 2)
    JjT = jnp.swapaxes(Jj, 1, 2)
    JT = jnp.where(side_j[..., None, None], JjT[e_idx], JiT[e_idx])
    # gate: dead slots, and the free-mask rows of C^T (as Ct * freep does)
    JT = JT * freep[grow][..., None] * valid[..., None, None].astype(dtype)

    # ---- per-segment RHS [b | left-if | right-if | slots] ---------------
    n_if = 2 * (p - 1)
    R = 1 + (2 + Lc) * D
    rf = (bp * freep).reshape(p, m, D)
    rhs = jnp.zeros((p, m, D, R), dtype)
    rhs = rhs.at[..., 0].set(rf)
    eyeD = jnp.eye(D, dtype=dtype)
    segs = jnp.arange(p)
    fseg = freep.reshape(p, m, D)
    left_gate = (segs >= 1).astype(dtype)[:, None, None]
    right_gate = (segs <= p - 2).astype(dtype)[:, None, None]
    rhs = rhs.at[:, 0, :, 1:1 + D].set(
        eyeD[None] * fseg[:, 0][:, :, None] * left_gate
    )
    rhs = rhs.at[:, m - 1, :, 1 + D:1 + 2 * D].set(
        eyeD[None] * fseg[:, m - 1][:, :, None] * right_gate
    )
    co = 1 + 2 * D
    si = jnp.broadcast_to(segs[:, None], (p, Lc))[:, :, None, None]
    li = lrow[:, :, None, None]
    drow = jnp.arange(D)[None, None, :, None]
    dcol = (co + jnp.arange(Lc)[None, :, None, None] * D
            + jnp.arange(D)[None, None, None, :])
    rhs = rhs.at[si, li, drow, dcol].set(JT)

    rhs = shard_p(rhs)
    sol = jax.vmap(bcr_apply_df)(factors, rhs)     # (p, m, D, R) df

    ud = DFM(sol.hi[..., 0].reshape(P, D), sol.lo[..., 0].reshape(P, D))

    # ---- global capacitance assembly ------------------------------------
    # cap columns: [interface edges (n_if) | loop edges (K)] * D, plus one
    # dummy column block for invalid scatter targets
    KD = (n_if + K) * D
    # per-segment map: local column c in [0, 2+Lc) -> global cap col block
    #   c=0 left-if  of seg s = row s*m   = interface edge 2(s-1)+1
    #   c=1 right-if of seg s = row (s+1)m-1 = interface edge 2s
    #   c>=2: loop slot -> n_if + edge index
    gcol_left = jnp.where(segs >= 1, 2 * (segs - 1) + 1, n_if + K)
    gcol_right = jnp.where(segs <= p - 2, 2 * segs, n_if + K)
    gcol_slots = jnp.where(valid, n_if + e_idx, n_if + K)
    gcol = jnp.concatenate(
        [gcol_left[:, None], gcol_right[:, None], gcol_slots], axis=1
    ).astype(jnp.int32)                             # (p, 2+Lc)

    rows_if = jnp.stack([t_idx - 1, t_idx], axis=1).reshape(-1)
    rows_needed = jnp.concatenate([rows_if, ei, ej]).astype(jnp.int32)
    NR = rows_needed.shape[0]
    sr = rows_needed // m
    lr = rows_needed % m
    Vblk = DFM(sol.hi[sr, lr, :, 1:], sol.lo[sr, lr, :, 1:])  # (NR,D,(2+Lc)D)
    gcol_r = gcol[sr]                               # (NR, 2+Lc)

    # Scatter the local blocks into global capacitance columns with TWO
    # collision-free .set scatters + one exact df_add (the previous
    # per-slot loop materialized (2+Lc) full (NR,D,KD) arrays — measured
    # as a dominant cost of the 16k sharded iteration). Collision
    # analysis per needed-row r (all its slots live in segment sr[r]):
    #   - interface columns occupy the disjoint range [0, n_if);
    #   - a side-i slot entry exists at most once per edge globally, so
    #     side-i loop columns are distinct; same for side-j;
    #   - the ONLY same-(row, col) pair is an edge with both endpoints
    #     in one segment: its i-entry (group A) and j-entry (group B)
    #     meet across groups and combine via the exact df_add.
    # Dead/gated slots already target the dummy column block KD.
    nslots = 2 + Lc
    Vr = DFM(
        Vblk.hi.reshape(NR, D, nslots, D).transpose(0, 2, 1, 3),
        Vblk.lo.reshape(NR, D, nslots, D).transpose(0, 2, 1, 3),
    )                                               # (NR, nslots, D, D)
    side_full = jnp.concatenate(
        [jnp.zeros((p, 2), bool), side_j], axis=1
    )[sr]                                           # (NR, nslots)
    dummy = jnp.full_like(gcol_r, n_if + K)
    colA = jnp.where(side_full, dummy, gcol_r)      # interfaces + side-i
    colB = jnp.where(side_full, gcol_r, dummy)      # side-j
    rr = jnp.arange(NR)[:, None, None, None]
    dr = jnp.arange(D)[None, None, :, None]

    def scatter(cols):
        cc = cols[:, :, None, None] * D + jnp.arange(D)[None, None, None, :]
        return DFM(
            jnp.zeros((NR, D, KD + D), dtype).at[rr, dr, cc].set(Vr.hi),
            jnp.zeros((NR, D, KD + D), dtype).at[rr, dr, cc].set(Vr.lo),
        )

    Vall = df_add(scatter(colA), scatter(colB))
    Vall = _df_sl(Vall, jnp.s_[:, :, :KD])

    CV_if = _df_sl(Vall, jnp.s_[:n_if])
    V_ei = _df_sl(Vall, jnp.s_[n_if:n_if + K])
    V_ej = _df_sl(Vall, jnp.s_[n_if + K:])
    CV_l = df_add(df_bmm(dfm(Ji), V_ei), df_bmm(dfm(Jj), V_ej))

    u_need = _df_sl(ud, rows_needed)
    Cu_if = DFM(u_need.hi[:n_if, :, None], u_need.lo[:n_if, :, None])
    Cu_l = df_add(
        df_bmm(dfm(Ji), DFM(u_need.hi[n_if:n_if + K, :, None],
                            u_need.lo[n_if:n_if + K, :, None])),
        df_bmm(dfm(Jj), DFM(u_need.hi[n_if + K:, :, None],
                            u_need.lo[n_if + K:, :, None])),
    )

    # W application (interface pair swap exactly as spike_core_solve_df)
    pair = jnp.arange(n_if).reshape(-1, 2)[:, ::-1].reshape(-1)
    CV_ifp = _df_sl(CV_if, pair)
    Cu_ifp = _df_sl(Cu_if, pair)
    BT = DFM(jnp.swapaxes(B_if.hi, 1, 2), jnp.swapaxes(B_if.lo, 1, 2))
    W_if = DFM(
        jnp.stack([BT.hi, B_if.hi], axis=1).reshape(n_if, D, D),
        jnp.stack([BT.lo, B_if.lo], axis=1).reshape(n_if, D, D),
    )
    WCV_if = df_bmm(W_if, CV_ifp)
    WCu_if = df_bmm(W_if, Cu_ifp)
    Wd_l = dfm(W_eff)
    WCV_l = df_bmm(Wd_l, CV_l)
    WCu_l = df_bmm(Wd_l, Cu_l)
    WCVd = DFM(jnp.concatenate([WCV_if.hi, WCV_l.hi]),
               jnp.concatenate([WCV_if.lo, WCV_l.lo]))
    WCud = DFM(jnp.concatenate([WCu_if.hi, WCu_l.hi]),
               jnp.concatenate([WCu_if.lo, WCu_l.lo]))

    Kc = n_if + K
    eyeKD = jnp.eye(Kc * D, dtype=dtype)
    Mcap_d = df_add(
        dfm(eyeKD),
        DFM(WCVd.hi.reshape(Kc * D, Kc * D),
            WCVd.lo.reshape(Kc * D, Kc * D)),
    )
    Mcap_inv = _inv_dense(Mcap_d.hi)
    WCu = (WCud.hi + WCud.lo).reshape(Kc * D)
    y = Mcap_inv @ WCu
    for _ in range(2):
        My = df_matmul(Mcap_d, dfm(y[:, None]))
        ry = WCu - (My.hi + My.lo)[:, 0]
        y = y + Mcap_inv @ ry

    # ---- correction x = u - V y, per-segment local columns ---------------
    # local y: gather the y blocks each segment's columns touch
    ypad = jnp.concatenate([y, jnp.zeros((D,), dtype)])
    ycols = (gcol[:, :, None] * D + jnp.arange(D)[None, None, :])
    y_loc = ypad[ycols].reshape(p, (2 + Lc) * D)    # (p, (2+Lc)D)
    Vseg = DFM(sol.hi[..., 1:], sol.lo[..., 1:])    # (p, m, D, (2+Lc)D)
    Vy = df_matmul(Vseg, dfm(y_loc[:, None, :, None]))  # (p, m, D, 1)
    xh = ud.hi - Vy.hi.reshape(P, D)
    xl = ud.lo - Vy.lo.reshape(P, D)
    return ((xh + xl) * freep)[:N], n_dropped
