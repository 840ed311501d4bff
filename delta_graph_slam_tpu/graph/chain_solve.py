"""Direct pose-graph solve: block cyclic reduction + Woodbury loops.

TPU-native replacement for CHOLMOD on SLAM graphs (the reference solves
with g2o's lm_var_cholmod, launch/delta_graph_slam.launch:81). A pose
graph's Hessian is an odometry *chain* (block-tridiagonal) plus a small
number of off-chain edges (loop closures, building de-overlap):

    H = T + C^T W C
    T = chain edges + unary priors + lam*I     (block tridiagonal)
    C = K off-chain binary edges, rows C_k x = Ji_k x_i + Jj_k x_j

T^{-1} is applied with block cyclic reduction (BCR): eliminate odd
block-rows level by level — each level is a batch of DxD inverses and
matmuls over half the remaining rows, so the whole solve is O(log N)
*sequential* steps of embarrassingly-parallel small-matrix math (the
shape the VPU/MXU wants), instead of the O(N) sequential sparse
factorization a CPU does. The off-chain correction uses the binomial
inverse theorem (no W^{-1}, so masked/padded edge slots with W=0 are
exact no-ops):

    H^{-1} g = u - V (I + W C V_c)^{-1} W C u,
    u = T^{-1} g,  V = T^{-1} C^T  (BCR with K*D stacked RHS)

Edges whose endpoints include a fully-fixed vertex are treated as
effectively unary (their only live contribution is a diagonal block), so
e.g. level-1 building refinement — keyframes frozen, every kf<->building
edge anchored on a fixed keyframe — has K ~ 0 and runs as a pure chain
solve.

Numerics: a SLAM chain's kappa grows ~ N^2 (Laplacian-like), so f32
elimination loses the whole mantissa at production sizes — measured
272% relative step error at N=4096 once LM's lambda drops below ~1e-5
(exactly the regime tail convergence needs; the LM visibly stalled at
chi2 0.41 / ATE 13.5 m vs the true optimum 0.2957 / 7.58 m). The
default precision="df" therefore runs the elimination in double-float
(graph/df_linalg.py, ~2^-48 eps): kappa * eps_df ~ 1e-7 at 4k — exact
Newton steps at any lambda, in f32-speed elementwise arithmetic that
XLA fuses (software f64 on TPU measured ~1000x slower). The optional
iterative-refinement pass (refine_steps) then mainly covers the
f32-formed Woodbury capacitance.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .lm_core import LinSys, bmm, bmv, matvec


def _edge_hessians(sys: LinSys):
    """Per-edge blocks Hii, Hjj, Hij (already robust-weighted; W=0 for
    inactive edges makes every downstream contribution vanish)."""
    WJi = bmm(sys.W, sys.Ji)
    WJj = bmm(sys.W, sys.Jj)
    JiT = jnp.swapaxes(sys.Ji, 1, 2)
    JjT = jnp.swapaxes(sys.Jj, 1, 2)
    return bmm(JiT, WJi), bmm(JjT, WJj), bmm(JiT, WJj)


def _classify(sys: LinSys, free_v):
    """(chainlike, off) edge masks: off = couples two free vertices more
    than one index apart; everything else folds into the tridiagonal.

    Gated by edge activity (any W != 0): level-masked / padded / robustly
    zero-weighted edges are exact no-ops either way, so they must not
    consume Woodbury slots or count toward capacity overflow (ADVICE r2).
    """
    active = jnp.any(sys.W != 0, axis=(1, 2))
    d = jnp.abs(sys.i - sys.j)
    off = (d > 1) & free_v[sys.i] & free_v[sys.j] & active
    return ~off, off


def offchain_overflow(sys: LinSys, free, K_cap):
    """Active off-chain edges beyond the Woodbury capacity (int32)."""
    free_v = jnp.any(free > 0, axis=1)
    _, off = _classify(sys, free_v)
    k_eff = min(int(K_cap), sys.i.shape[0])
    return jnp.maximum(
        jnp.sum(off).astype(jnp.int32) - k_eff, 0
    ).astype(jnp.int32)


def assemble_tridiag(sys: LinSys, N, free, lam, chain_mask):
    """T as (A (N,D,D), B (N,D,D)) with B[k] = T[k,k-1], B[0]=0.

    Fixed dims get identity rows/cols (their dx is pinned to 0); lam is
    added on free dims only.
    """
    D = free.shape[1]
    dtype = free.dtype
    Hii, Hjj, Hij = _edge_hessians(sys)
    m = chain_mask[:, None, None].astype(dtype)

    A = jax.ops.segment_sum(Hii * m, sys.i, num_segments=N)
    A = A + jax.ops.segment_sum(Hjj * m, sys.j, num_segments=N)

    # sub-diagonal: edge (i, j=i+1) puts Hij^T at B[i+1]; (i=j+1, j) puts
    # Hij at B[i]. Both land at index max(i, j).
    sub_ok = chain_mask & (jnp.abs(sys.i - sys.j) == 1)
    HijT = jnp.swapaxes(Hij, 1, 2)
    val = jnp.where((sys.j > sys.i)[:, None, None], HijT, Hij)
    val = val * sub_ok[:, None, None].astype(dtype)
    B = jax.ops.segment_sum(val, jnp.maximum(sys.i, sys.j), num_segments=N)

    eye = jnp.eye(D, dtype=dtype)
    fm = free[:, :, None] * free[:, None, :]
    A = A * fm + (1.0 - fm) * eye[None] + lam * free[:, :, None] * eye[None]
    B = B * free[:, :, None] * jnp.roll(free, 1, axis=0)[:, None, :]
    B = B.at[0].set(0.0)
    return A, B


def assemble_tridiag_df(sys: LinSys, N, free, lam, chain_mask):
    """Double-float assembly of T (see assemble_tridiag for semantics).

    Both the J^T W J products and the per-vertex accumulation run in
    double-float: f32 assembly perturbs T by ~1e-7 relative, and with
    kappa(T) ~ N^2 that alone puts O(1) error in the solve at small
    lambda (measured as step errors growing ~1/lambda in the LM tail)
    no matter how exact the elimination is.
    """
    from .df_linalg import DFM, df_add, df_bT, df_bmm, df_segment_sum, dfm

    D = free.shape[1]
    dtype = free.dtype
    Jid, Jjd, Wd = dfm(sys.Ji), dfm(sys.Jj), dfm(sys.W)
    WJi = df_bmm(Wd, Jid)
    WJj = df_bmm(Wd, Jjd)
    JiT, JjT = df_bT(Jid), df_bT(Jjd)
    Hii = df_bmm(JiT, WJi)
    Hjj = df_bmm(JjT, WJj)
    Hij = df_bmm(JiT, WJj)

    m = chain_mask[:, None, None].astype(dtype)
    both = DFM(jnp.concatenate([Hii.hi * m, Hjj.hi * m]),
               jnp.concatenate([Hii.lo * m, Hjj.lo * m]))
    A = df_segment_sum(both, jnp.concatenate([sys.i, sys.j]), N)

    sub_ok = (chain_mask & (jnp.abs(sys.i - sys.j) == 1))[:, None, None]
    HijT = df_bT(Hij)
    swap = (sys.j > sys.i)[:, None, None]
    val = DFM(
        jnp.where(swap, HijT.hi, Hij.hi) * sub_ok.astype(dtype),
        jnp.where(swap, HijT.lo, Hij.lo) * sub_ok.astype(dtype),
    )
    B = df_segment_sum(val, jnp.maximum(sys.i, sys.j), N)

    eye = jnp.eye(D, dtype=dtype)
    fm = free[:, :, None] * free[:, None, :]
    diag_extra = (1.0 - fm) * eye[None] + lam * free[:, :, None] * eye[None]
    A = df_add(DFM(A.hi * fm, A.lo * fm), dfm(diag_extra))
    bm = free[:, :, None] * jnp.roll(free, 1, axis=0)[:, None, :]
    B = DFM((B.hi * bm).at[0].set(0.0), (B.lo * bm).at[0].set(0.0))
    return A, B


def assemble_tridiag_df_chain(sys: LinSys, N, free, lam, chain_mask,
                              n_chain):
    """Shift-based df assembly for the chain-first edge layout.

    Contract (SE2GraphBuilder.to_arrays(chain_first=True)): table rows
    [0..n_chain-1] hold the consecutive odometry edges, row k connecting
    vertices {k, k+1} in either stored orientation (the delta backend
    stores them reversed, new->prev; inactive slots have W=0 — exact
    no-ops). The tridiagonal then assembles with pure concatenation
    shifts:

        A[v] += blk(v), A[v+1] += blk(v+1),  B[v+1] = T[v+1, v]

    — no scatters at all for the chain, which was the dominant
    per-iteration cost of the general path (the digit-channel
    df_segment_sum runs 6 scatter passes over 2E items; measured ~5 ms
    of a 9.8 ms LM iteration at 4k nodes on TPU v5e). The few remaining
    rows (loops, priors-as-unary, de-overlap) still go through the
    exact scatter path, but over E - n_chain items only.
    """
    from .df_linalg import DFM, df_add, df_bT, df_bmm, df_segment_sum, dfm

    D = free.shape[1]
    dtype = free.dtype
    nc = n_chain

    def seg(x):
        return x[:nc]

    Jic, Jjc, Wc = dfm(seg(sys.Ji)), dfm(seg(sys.Jj)), dfm(seg(sys.W))
    WJi = df_bmm(Wc, Jic)
    WJj = df_bmm(Wc, Jjc)
    JiT, JjT = df_bT(Jic), df_bT(Jjc)
    Hii = df_bmm(JiT, WJi)            # at vertex i
    Hjj = df_bmm(JjT, WJj)            # at vertex j
    Hij = df_bmm(JiT, WJj)            # block (i, j)

    # orientation select: slot k stores (i=k, j=k+1) or (i=k+1, j=k).
    # top lands at vertex k, bot at k+1; the sub-diagonal block
    # T[k+1, k] is Hij^T for forward rows and Hij for reversed rows.
    rev = (sys.i[:nc] > sys.j[:nc])[:, None, None]

    def sel(R, F):
        return DFM(jnp.where(rev, R.hi, F.hi), jnp.where(rev, R.lo, F.lo))

    top = sel(Hjj, Hii)
    bot = sel(Hii, Hjj)
    HijT = df_bT(Hij)
    sub = sel(Hij, HijT)

    z1 = jnp.zeros((N - nc, D, D), dtype)
    zb = jnp.zeros((1, D, D), dtype)

    def cat_top(X):                    # (nc,..) -> (N,..) rows [0..nc-1]
        return DFM(jnp.concatenate([X.hi, z1]),
                   jnp.concatenate([X.lo, z1]))

    def cat_bot(X):                    # (nc,..) -> (N,..) rows [1..nc]
        pad = jnp.zeros((N - nc - 1, D, D), dtype)
        return DFM(jnp.concatenate([zb, X.hi, pad]),
                   jnp.concatenate([zb, X.lo, pad]))

    A = df_add(cat_top(top), cat_bot(bot))
    B = cat_bot(sub)

    # remaining rows: loops / priors / unary-ized edges — exact scatter
    # over the small tail only
    if sys.i.shape[0] > nc:
        rs = jnp.s_[nc:]
        Jir, Jjr, Wr = dfm(sys.Ji[rs]), dfm(sys.Jj[rs]), dfm(sys.W[rs])
        m = chain_mask[rs][:, None, None].astype(dtype)
        WJir = df_bmm(Wr, Jir)
        WJjr = df_bmm(Wr, Jjr)
        JiTr, JjTr = df_bT(Jir), df_bT(Jjr)
        Hiir = df_bmm(JiTr, WJir)
        Hjjr = df_bmm(JjTr, WJjr)
        Hijr = df_bmm(JiTr, WJjr)
        both = DFM(jnp.concatenate([Hiir.hi * m, Hjjr.hi * m]),
                   jnp.concatenate([Hiir.lo * m, Hjjr.lo * m]))
        ids = jnp.concatenate([sys.i[rs], sys.j[rs]])
        A = df_add(A, df_segment_sum(both, ids, N))

        ir, jr = sys.i[rs], sys.j[rs]
        sub_ok = (chain_mask[rs] & (jnp.abs(ir - jr) == 1))[:, None, None]
        HijTr = df_bT(Hijr)
        swap = (jr > ir)[:, None, None]
        val = DFM(
            jnp.where(swap, HijTr.hi, Hijr.hi) * sub_ok.astype(dtype),
            jnp.where(swap, HijTr.lo, Hijr.lo) * sub_ok.astype(dtype),
        )
        B = df_add(B, df_segment_sum(val, jnp.maximum(ir, jr), N))

    eye = jnp.eye(D, dtype=dtype)
    fm = free[:, :, None] * free[:, None, :]
    diag_extra = (1.0 - fm) * eye[None] + lam * free[:, :, None] * eye[None]
    A = df_add(DFM(A.hi * fm, A.lo * fm), dfm(diag_extra))
    bm = free[:, :, None] * jnp.roll(free, 1, axis=0)[:, None, :]
    B = DFM((B.hi * bm).at[0].set(0.0), (B.lo * bm).at[0].set(0.0))
    return A, B


def _inv_dense(M):
    """Dense inverse that works in f64 on TPU.

    XLA:TPU has no f64 LU ("Only F32 ... implemented in LuDecomposition"),
    so for f64 inputs invert in f32 and polish with one Newton step
    X <- X (2I - M X), which doubles the correct digits (~1e-7 -> ~1e-14).
    The matrices here are small (base block <= 64*D, capacitance K*D), so
    the two extra emulated-f64 matmuls are cheap.
    """
    if M.dtype == jnp.float64:
        X = jnp.linalg.inv(M.astype(jnp.float32)).astype(jnp.float64)
        eye2 = 2.0 * jnp.eye(M.shape[-1], dtype=M.dtype)
        return X @ (eye2 - M @ X)
    return jnp.linalg.inv(M)


def _inv_blocks(A):
    """Batched small-block inverse. For D=3 use the closed-form adjugate
    (a handful of fused elementwise ops) — jnp.linalg.inv lowers to a
    pivoted LU whose tiny sequential steps dominate the BCR factor time
    on TPU. Falls back to linalg.inv for other D.

    Stability (ADVICE r2): the adjugate inverse is less robust than
    pivoted LU for near-singular blocks, but every block inverted here
    is an SPD reduced diagonal block of T = H + lam*I with lam >=
    lm_tau * max|diag H| (lm_core lam0) — and every reduced block of an
    SPD matrix is itself SPD with lambda_min bounded below by
    lambda_min(T) >= lam (Schur complements of SPD matrices cannot fall
    below the global spectral floor), so det never approaches zero at
    any elimination level. The f32 path is additionally restricted to
    small N (chain_precision docs); the df path uses df_invD's
    compensated adjugate."""
    if A.shape[-1] == 3:
        a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
        d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
        g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
        A00 = e * i - f * h
        A01 = c * h - b * i
        A02 = b * f - c * e
        A10 = f * g - d * i
        A11 = a * i - c * g
        A12 = c * d - a * f
        A20 = d * h - e * g
        A21 = b * g - a * h
        A22 = a * e - b * d
        det = a * A00 + b * A10 + c * A20
        inv_det = 1.0 / det
        adj = jnp.stack([
            jnp.stack([A00, A01, A02], -1),
            jnp.stack([A10, A11, A12], -1),
            jnp.stack([A20, A21, A22], -1),
        ], -2)
        return adj * inv_det[..., None, None]
    return _inv_dense(A)


def bcr_factor(A, B, base_blocks=64):
    """Cyclic-reduction factorization of block-tridiagonal T.

    A (M,D,D), B (M,D,D) sub-diagonal (B[0]=0); M a power of two.
    Returns (levels, base_inv) where each level holds the odd-row
    inverses and couplings needed to sweep any RHS.
    """
    D = A.shape[1]
    dtype = A.dtype
    levels = []
    while A.shape[0] > base_blocks:
        Ao = A[1::2]
        B_o = B[1::2]                                       # B[o], o=2t+1
        B_o1 = jnp.concatenate([B[2::2], jnp.zeros_like(B[:1])])  # B[o+1]
        B_e = B[0::2]                                       # B[k], k=2t
        Ao_inv = _inv_blocks(Ao)
        Ao_inv_Bo = bmm(Ao_inv, B_o)
        Ao_inv_B1T = bmm(Ao_inv, jnp.swapaxes(B_o1, 1, 2))
        levels.append((Ao_inv, B_o, B_o1, B_e, Ao_inv_Bo, Ao_inv_B1T))

        BoT = jnp.swapaxes(B_o, 1, 2)
        A = (A[0::2]
             - bmm(BoT, Ao_inv_Bo)                          # right odd nbr
             - bmm(B_e, jnp.roll(Ao_inv_B1T, 1, axis=0)))   # left odd nbr
        B = -bmm(B_e, jnp.roll(Ao_inv_Bo, 1, axis=0))
        B = B.at[0].set(0.0)

    # dense base inverse
    Mb = A.shape[0]
    Hd = jnp.zeros((Mb * D, Mb * D), dtype)
    idx = jnp.arange(Mb)
    rr = D * idx[:, None, None] + jnp.arange(D)[None, :, None]
    cc = D * idx[:, None, None] + jnp.arange(D)[None, None, :]
    Hd = Hd.at[rr, cc].add(A)
    r2 = D * idx[1:, None, None] + jnp.arange(D)[None, :, None]
    c2 = D * (idx[1:] - 1)[:, None, None] + jnp.arange(D)[None, None, :]
    Hd = Hd.at[r2, c2].add(B[1:])
    Hd = Hd.at[c2.transpose(0, 2, 1), r2.transpose(0, 2, 1)].add(
        jnp.swapaxes(B[1:], 1, 2)
    )
    return levels, _inv_dense(Hd)


def bcr_apply(factors, g):
    """Solve T x = g with a precomputed bcr_factor. g: (M,D,R)."""
    levels, base_inv = factors
    dtype = g.dtype
    saved = []
    for Ao_inv, B_o, B_o1, B_e, _, _ in levels:
        go = g[1::2]
        t1 = bmm(Ao_inv, go)
        saved.append(t1)
        g = (g[0::2]
             - bmm(jnp.swapaxes(B_o, 1, 2), t1)
             - bmm(B_e, jnp.roll(t1, 1, axis=0)))

    Mb, D, R = g.shape
    x = (base_inv @ g.reshape(Mb * D, R)).reshape(Mb, D, R)

    for (Ao_inv, B_o, B_o1, _, Ao_inv_Bo, Ao_inv_B1T), t1 in zip(
        reversed(levels), reversed(saved)
    ):
        x_even = x
        x_right = jnp.concatenate([x_even[1:], jnp.zeros_like(x_even[:1])])
        x_odd = t1 - bmm(Ao_inv_Bo, x_even) - bmm(Ao_inv_B1T, x_right)
        M2 = x_even.shape[0] * 2
        x = jnp.zeros((M2,) + x_even.shape[1:], dtype)
        x = x.at[0::2].set(x_even).at[1::2].set(x_odd)
    return x


def bcr_factor_df(A, B):
    """Double-float cyclic-reduction factorization (graph/df_linalg.py).

    Why: f32 elimination down an N-block SLAM chain has forward error
    ~ C * kappa * eps with kappa ~ N^2; at N=4096 the LM step is 100%+
    wrong once the damping drops below ~1e-5 (measured), which is
    exactly the regime the tail of Levenberg-Marquardt lives in. The
    df arithmetic (~2^-48 eps) makes every step an exact Newton step at
    any lambda. Reduces all the way to one block (a dense base inverse
    would need Newton polishing whose contraction ||I - M X0|| ~
    kappa*eps_f32 > 1 diverges at 16k nodes — df_inv3 at M=1 does not).

    A (M,D,D), B (M,D,D) f32, M a power of two. Returns df levels +
    df base inverse for bcr_apply_df.
    """
    from .df_linalg import DFM, df_add, df_bT, df_bmm, df_invD, df_neg, dfm

    def sl(X, s):
        return DFM(X.hi[s], X.lo[s])

    def roll1(X):
        return DFM(jnp.roll(X.hi, 1, axis=0), jnp.roll(X.lo, 1, axis=0))

    Ad = A if isinstance(A, DFM) else dfm(A)
    Bd = B if isinstance(B, DFM) else dfm(B)
    levels = []
    while Ad.hi.shape[0] > 1:
        Ao = sl(Ad, jnp.s_[1::2])
        B_o = sl(Bd, jnp.s_[1::2])
        B_o1 = DFM(
            jnp.concatenate([Bd.hi[2::2], jnp.zeros_like(Bd.hi[:1])]),
            jnp.concatenate([Bd.lo[2::2], jnp.zeros_like(Bd.lo[:1])]),
        )
        B_e = sl(Bd, jnp.s_[0::2])
        Ao_inv = df_invD(Ao)
        Ao_inv_Bo = df_bmm(Ao_inv, B_o)
        Ao_inv_B1T = df_bmm(Ao_inv, df_bT(B_o1))
        levels.append((Ao_inv, B_o, B_e, Ao_inv_Bo, Ao_inv_B1T))

        BoT = df_bT(B_o)
        Ae = sl(Ad, jnp.s_[0::2])
        Ad = df_add(
            Ae,
            df_neg(df_add(df_bmm(BoT, Ao_inv_Bo),
                          df_bmm(B_e, roll1(Ao_inv_B1T)))),
        )
        Bn = df_neg(df_bmm(B_e, roll1(Ao_inv_Bo)))
        Bd = DFM(Bn.hi.at[0].set(0.0), Bn.lo.at[0].set(0.0))
    return levels, df_invD(Ad)


def bcr_apply_df(factors, g):
    """Solve T x = g in double-float; g (M,D,R) f32 or DFM, returns DFM.

    Returns BOTH limbs: T^{-1} amplifies the chain's global modes, so
    the solution components are huge (~1e4x the final step) and the
    Woodbury combination x = u - V y cancels them — collapsing to f32
    before that subtraction would lose exactly the bits that matter
    (measured as the chi2-0.41 LM stall the df path exists to fix)."""
    from .df_linalg import DFM, df_add, df_bT, df_bmm, df_neg, dfm

    def roll1(X):
        return DFM(jnp.roll(X.hi, 1, axis=0), jnp.roll(X.lo, 1, axis=0))

    levels, base_inv = factors
    gd = g if isinstance(g, DFM) else dfm(g)
    saved = []
    for Ao_inv, B_o, B_e, _, _ in levels:
        go = DFM(gd.hi[1::2], gd.lo[1::2])
        t1 = df_bmm(Ao_inv, go)
        saved.append(t1)
        ge = DFM(gd.hi[0::2], gd.lo[0::2])
        gd = df_add(
            ge,
            df_neg(df_add(df_bmm(df_bT(B_o), t1),
                          df_bmm(B_e, roll1(t1)))),
        )

    x = df_bmm(base_inv, gd)

    for (Ao_inv, B_o, _, Ao_inv_Bo, Ao_inv_B1T), t1 in zip(
        reversed(levels), reversed(saved)
    ):
        x_even = x
        x_right = DFM(
            jnp.concatenate([x_even.hi[1:], jnp.zeros_like(x_even.hi[:1])]),
            jnp.concatenate([x_even.lo[1:], jnp.zeros_like(x_even.lo[:1])]),
        )
        x_odd = df_add(
            t1,
            df_neg(df_add(df_bmm(Ao_inv_Bo, x_even),
                          df_bmm(Ao_inv_B1T, x_right))),
        )
        M2 = x_even.hi.shape[0] * 2
        hi = jnp.zeros((M2,) + x_even.hi.shape[1:], x_even.hi.dtype)
        lo = jnp.zeros_like(hi)
        hi = hi.at[0::2].set(x_even.hi).at[1::2].set(x_odd.hi)
        lo = lo.at[0::2].set(x_even.lo).at[1::2].set(x_odd.lo)
        x = DFM(hi, lo)
    return x


def chain_core_solve_df(Ad, Bd, b, free, N, off=None):
    """Direct df solve on a PREASSEMBLED tridiagonal (the chain_lm fast
    path; see chain_solve for the generic entry that assembles from a
    LinSys).

    Ad, Bd: DFM (N,D,D) with fixed-dim identity rows/cols AND the LM
    damping already applied (B[0] = 0). b: (N,D) f32 RHS. off: optional
    precompacted off-chain table (ei, ej, Ji, Jj, W) of length K with
    inactive slots zero-weighted (exact no-ops).

    One BCR factorization, then ONE joint df apply over [b | C^T] —
    the separate u apply of the generic path costs an extra full level
    sweep (measured 0.42 ms at 4k nodes on TPU v5e).
    """
    from .df_linalg import DFM, df_add, df_bmm, df_matmul, dfm

    D = b.shape[1]
    dtype = b.dtype
    P = 1 << max(int(N - 1).bit_length(), 2)
    padA = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (P - N, D, D))
    padZ = jnp.zeros((P - N, D, D), dtype)
    Ad = DFM(jnp.concatenate([Ad.hi, padA]), jnp.concatenate([Ad.lo, padZ]))
    Bd = DFM(jnp.concatenate([Bd.hi, padZ]), jnp.concatenate([Bd.lo, padZ]))
    factors = bcr_factor_df(Ad, Bd)

    rf = (b * free)[:, :, None]
    rf = jnp.concatenate([rf, jnp.zeros((P - N, D, 1), dtype)])
    if off is None:
        x = bcr_apply_df(factors, rf)
        x = DFM(x.hi[:N, :, 0], x.lo[:N, :, 0])
        return (x.hi + x.lo) * free

    ei, ej, Ji, Jj, W = off
    K = ei.shape[0]
    eyeK = jnp.eye(K * D, dtype=dtype).reshape(K, D, K * D)
    Ct = jax.ops.segment_sum(
        bmm(jnp.swapaxes(Ji, 1, 2), eyeK), ei, num_segments=N
    )
    Ct = Ct + jax.ops.segment_sum(
        bmm(jnp.swapaxes(Jj, 1, 2), eyeK), ej, num_segments=N
    )
    Ct = Ct * free[:, :, None]
    Ct = jnp.concatenate([Ct, jnp.zeros((P - N, D, K * D), dtype)])

    sol = bcr_apply_df(factors, jnp.concatenate([rf, Ct], axis=-1))
    ud = DFM(sol.hi[:N, :, 0], sol.lo[:N, :, 0])          # (N,D)
    Vd = DFM(sol.hi[:N, :, 1:], sol.lo[:N, :, 1:])        # (N,D,K*D)

    # Woodbury in df (see _chain_solve_impl's df branch for the error
    # analysis: u and V carry ~1e4x-amplified global chain modes that
    # cancel in x = u - V y; the capacitance solve is f32-preconditioned
    # df-refined)
    CVd = df_add(
        df_bmm(dfm(Ji), DFM(Vd.hi[ei], Vd.lo[ei])),
        df_bmm(dfm(Jj), DFM(Vd.hi[ej], Vd.lo[ej])),
    )
    WCVd = df_bmm(dfm(W), CVd)
    eyeKD = jnp.eye(K * D, dtype=dtype)
    Mcap_d = df_add(
        dfm(eyeKD),
        DFM(WCVd.hi.reshape(K * D, K * D), WCVd.lo.reshape(K * D, K * D)),
    )
    Mcap_inv = _inv_dense(Mcap_d.hi)
    Cud = df_add(
        df_bmm(dfm(Ji), DFM(ud.hi[ei, :, None], ud.lo[ei, :, None])),
        df_bmm(dfm(Jj), DFM(ud.hi[ej, :, None], ud.lo[ej, :, None])),
    )
    Cu = (Cud.hi + Cud.lo)[:, :, 0]
    WCu = bmv(W, Cu).reshape(K * D)
    y = Mcap_inv @ WCu
    for _ in range(2):
        My = df_matmul(Mcap_d, dfm(y[:, None]))
        ry = WCu - (My.hi + My.lo)[:, 0]
        y = y + Mcap_inv @ ry
    V2 = DFM(Vd.hi.reshape(N * D, K * D), Vd.lo.reshape(N * D, K * D))
    Vy = df_matmul(V2, dfm(y[:, None]))
    xh = ud.hi - Vy.hi.reshape(N, D)
    xl = ud.lo - Vy.lo.reshape(N, D)
    return (xh + xl) * free


def _offchain_compact(sys: LinSys, off_mask, K_cap):
    """Gather the first K_cap off-chain edges (sorted: off first)."""
    order = jnp.argsort(~off_mask)[:K_cap]
    take = lambda a: a[order]
    live = off_mask[order]
    gate = live[:, None, None].astype(sys.W.dtype)
    return (take(sys.i), take(sys.j), take(sys.Ji) * gate,
            take(sys.Jj) * gate, take(sys.W) * gate,
            jnp.sum(off_mask) - jnp.sum(live))


@partial(jax.jit, static_argnames=("N", "K_cap", "base_blocks",
                                   "refine_steps", "precision", "n_chain"))
def chain_solve(sys: LinSys, b, free, lam, N, K_cap=128, base_blocks=64,
                refine_steps=1, precision="df", n_chain=0):
    """Direct solve (H + lam I) x = b. Returns (x (N,D), n_dropped).

    n_dropped > 0 means more off-chain edges than K_cap — the caller
    should re-dispatch with a bigger capacity (host-side bucketing).

    n_chain > 0 opts into the chain-first fast path: table rows
    [0..n_chain-1] are guaranteed to be the consecutive odometry edges
    (row k <-> vertices (k, k+1); SE2GraphBuilder.to_arrays
    chain_first=True). Assembly then uses shifts instead of scatters.

    precision="df" (default) runs the cyclic-reduction elimination in
    double-float (bcr_factor_df): an N-node chain has kappa ~ N^2, so
    f32 elimination loses the entire mantissa at production sizes —
    measured 272% step error at 4k nodes / small lambda, which stalls
    LM far from the optimum (ATE 13.5 m vs the true 7.6 m). "f32" keeps
    the old single-precision path (fine for N <~ 512 or loose lambda).

    All f32 matmuls run at HIGHEST precision: the TPU's default
    bf16-pass matmul (8-bit mantissa) destroys the block elimination —
    measured chi2 100x worse than f32 on a 4k-node solve.
    """
    with jax.default_matmul_precision("highest"):
        return _chain_solve_impl(sys, b, free, lam, N, K_cap, base_blocks,
                                 refine_steps, precision, n_chain)


def _chain_solve_impl(sys, b, free, lam, N, K_cap, base_blocks,
                      refine_steps, precision, n_chain=0):
    K_cap = min(K_cap, sys.i.shape[0])  # tiny graphs: fewer edges than slots
    D = b.shape[1]
    dtype = b.dtype
    free_v = jnp.any(free > 0, axis=1)
    chain_mask, off_mask = _classify(sys, free_v)

    P = 1 << max(int(N - 1).bit_length(), int(base_blocks).bit_length())
    if precision == "df":
        from .df_linalg import DFM

        if n_chain:
            Ad, Bd = assemble_tridiag_df_chain(sys, N, free, lam,
                                               chain_mask, n_chain)
        else:
            Ad, Bd = assemble_tridiag_df(sys, N, free, lam, chain_mask)
        padA = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (P - N, D, D))
        padZ = jnp.zeros((P - N, D, D), dtype)
        Ad = DFM(jnp.concatenate([Ad.hi, padA]),
                 jnp.concatenate([Ad.lo, padZ]))
        Bd = DFM(jnp.concatenate([Bd.hi, padZ]),
                 jnp.concatenate([Bd.lo, padZ]))
        factors_df = bcr_factor_df(Ad, Bd)

        def apply_T_df(g):
            return bcr_apply_df(factors_df, g)

        def apply_T(g):
            r = apply_T_df(g)
            return r.hi + r.lo
    else:
        A, B = assemble_tridiag(sys, N, free, lam, chain_mask)
        padA = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (P - N, D, D))
        A = jnp.concatenate([A, padA])
        B = jnp.concatenate([B, jnp.zeros((P - N, D, D), dtype)])
        factors = bcr_factor(A, B, base_blocks=base_blocks)

        def apply_T(g):
            return bcr_apply(factors, g)

    if K_cap == 0:
        # pure chain solve (e.g. level-1 building refinement: every edge
        # is anchored on a frozen keyframe -> no off-chain coupling)
        n_drop = jnp.sum(off_mask)

        def solve_once(rhs):
            rf = (rhs * free)[:, :, None]
            rf = jnp.concatenate([rf, jnp.zeros((P - N, D, 1), dtype)])
            return apply_T(rf)[:N, :, 0] * free
    else:
        ei, ej, Ji, Jj, W, n_drop = _offchain_compact(sys, off_mask, K_cap)
        K = K_cap

        # V = T^-1 C^T and the capacitance matrix (RHS-independent)
        eyeK = jnp.eye(K * D, dtype=dtype).reshape(K, D, K * D)
        Ct = jax.ops.segment_sum(
            bmm(jnp.swapaxes(Ji, 1, 2), eyeK), ei, num_segments=N
        )
        Ct = Ct + jax.ops.segment_sum(
            bmm(jnp.swapaxes(Jj, 1, 2), eyeK), ej, num_segments=N
        )
        Ct = Ct * free[:, :, None]
        Ct = jnp.concatenate([Ct, jnp.zeros((P - N, D, K * D), dtype)])
        if precision == "df":
            # Full-df Woodbury: u and V carry the chain's amplified
            # global modes (entries ~1e4x the step), and BOTH C-products
            # and the final x = u - V y cancel them. Everything between
            # the df T-solves and the final collapse stays two-limb;
            # only the well-conditioned capacitance inverse (measured
            # kappa ~2e3 on the bench graph) runs in f32.
            from .df_linalg import DFM, df_add, df_bmm, df_matmul, dfm

            Vd = apply_T_df(Ct)
            Vd = DFM(Vd.hi[:N], Vd.lo[:N])                    # (N,D,K*D)
            CVd = df_add(
                df_bmm(dfm(Ji), DFM(Vd.hi[ei], Vd.lo[ei])),
                df_bmm(dfm(Jj), DFM(Vd.hi[ej], Vd.lo[ej])),
            )
            WCVd = df_bmm(dfm(W), CVd)                        # (K,D,K*D)
            eyeKD = jnp.eye(K * D, dtype=dtype)
            Mcap_d = df_add(
                dfm(eyeKD),
                DFM(WCVd.hi.reshape(K * D, K * D),
                    WCVd.lo.reshape(K * D, K * D)),
            )
            Mcap_inv = _inv_dense(Mcap_d.hi)
            V2 = DFM(Vd.hi.reshape(N * D, K * D),
                     Vd.lo.reshape(N * D, K * D))

            def solve_once(rhs):
                rf = (rhs * free)[:, :, None]
                rf = jnp.concatenate([rf, jnp.zeros((P - N, D, 1), dtype)])
                ud = apply_T_df(rf)
                ud = DFM(ud.hi[:N, :, 0], ud.lo[:N, :, 0])    # (N,D)
                Cud = df_add(
                    df_bmm(dfm(Ji), DFM(ud.hi[ei, :, None],
                                        ud.lo[ei, :, None])),
                    df_bmm(dfm(Jj), DFM(ud.hi[ej, :, None],
                                        ud.lo[ej, :, None])),
                )
                Cu = (Cud.hi + Cud.lo)[:, :, 0]               # (K,D)
                WCu = bmv(W, Cu).reshape(K * D)
                # f32-preconditioned df refinement of the capacitance
                # solve: kappa(Mcap) grows as lambda -> 0 (it carries
                # T^{-1}), so a plain f32 inverse caps step accuracy in
                # exactly the tail LM regime; two df-residual passes
                # contract the error by (kappa * eps_f32)^2.
                y = Mcap_inv @ WCu
                for _ in range(2):
                    My = df_matmul(Mcap_d, dfm(y[:, None]))
                    ry = WCu - (My.hi + My.lo)[:, 0]
                    y = y + Mcap_inv @ ry
                Vy = df_matmul(V2, dfm(y[:, None]))           # (N*D,1) df
                xh = ud.hi - Vy.hi.reshape(N, D)              # Sterbenz
                xl = ud.lo - Vy.lo.reshape(N, D)
                return (xh + xl) * free
        else:
            V = apply_T(Ct)[:N]                               # (N,D,K*D)
            CV = bmm(Ji, V[ei]) + bmm(Jj, V[ej])
            Mcap = (jnp.eye(K * D, dtype=dtype)
                    + bmm(W, CV).reshape(K * D, K * D))
            Mcap_inv = _inv_dense(Mcap)

            def solve_once(rhs):
                rf = (rhs * free)[:, :, None]
                rf = jnp.concatenate([rf, jnp.zeros((P - N, D, 1), dtype)])
                u = apply_T(rf)[:N, :, 0]
                Cu = bmv(Ji, u[ei]) + bmv(Jj, u[ej])
                WCu = bmv(W, Cu).reshape(K * D)
                return (u - V @ (Mcap_inv @ WCu)) * free

    x = solve_once(b)
    for _ in range(refine_steps):
        r = b * free - matvec(sys, x, free, lam)
        x = x + solve_once(r)
    return x, n_drop
