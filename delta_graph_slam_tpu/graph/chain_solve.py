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

Numerics: elimination down a long f32 chain leaves ~1e-2 relative step
error (kappa(H) ~ 1e7); one iterative-refinement pass against the full
(H + lam I) residual — reusing the same BCR factors and Woodbury
capacitance — brings it to ~1e-4, plenty for an LM step (CG at rtol 1e-5
is no more exact). The factor is rebuilt every LM iteration anyway
(lam and the linearization change), so refinement costs only one extra
single-RHS sweep.
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
    than one index apart; everything else folds into the tridiagonal."""
    d = jnp.abs(sys.i - sys.j)
    off = (d > 1) & free_v[sys.i] & free_v[sys.j]
    return ~off, off


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


def _inv_blocks(A):
    """Batched small-block inverse. For D=3 use the closed-form adjugate
    (a handful of fused elementwise ops) — jnp.linalg.inv lowers to a
    pivoted LU whose tiny sequential steps dominate the BCR factor time
    on TPU. Falls back to linalg.inv for other D."""
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
    return jnp.linalg.inv(A)


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
    return levels, jnp.linalg.inv(Hd)


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
                                   "refine_steps"))
def chain_solve(sys: LinSys, b, free, lam, N, K_cap=128, base_blocks=64,
                refine_steps=1):
    """Direct solve (H + lam I) x = b. Returns (x (N,D), n_dropped).

    n_dropped > 0 means more off-chain edges than K_cap — the caller
    should re-dispatch with a bigger capacity (host-side bucketing).

    All matmuls run at HIGHEST precision: the TPU's default bf16-pass
    matmul (8-bit mantissa) destroys the block elimination down a long
    chain — measured chi2 100x worse than f32 on a 4k-node solve.
    """
    with jax.default_matmul_precision("highest"):
        return _chain_solve_impl(sys, b, free, lam, N, K_cap, base_blocks,
                                 refine_steps)


def _chain_solve_impl(sys, b, free, lam, N, K_cap, base_blocks,
                      refine_steps):
    K_cap = min(K_cap, sys.i.shape[0])  # tiny graphs: fewer edges than slots
    D = b.shape[1]
    dtype = b.dtype
    free_v = jnp.any(free > 0, axis=1)
    chain_mask, off_mask = _classify(sys, free_v)

    P = 1 << max(int(N - 1).bit_length(), int(base_blocks).bit_length())
    A, B = assemble_tridiag(sys, N, free, lam, chain_mask)
    padA = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (P - N, D, D))
    A = jnp.concatenate([A, padA])
    B = jnp.concatenate([B, jnp.zeros((P - N, D, D), dtype)])
    factors = bcr_factor(A, B, base_blocks=base_blocks)

    if K_cap == 0:
        # pure chain solve (e.g. level-1 building refinement: every edge
        # is anchored on a frozen keyframe -> no off-chain coupling)
        n_drop = jnp.sum(off_mask)

        def solve_once(rhs):
            rf = (rhs * free)[:, :, None]
            rf = jnp.concatenate([rf, jnp.zeros((P - N, D, 1), dtype)])
            return bcr_apply(factors, rf)[:N, :, 0] * free
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
        V = bcr_apply(factors, Ct)[:N]                        # (N,D,K*D)
        CV = bmm(Ji, V[ei]) + bmm(Jj, V[ej])
        Mcap = jnp.eye(K * D, dtype=dtype) + bmm(W, CV).reshape(K * D, K * D)
        Mcap_inv = jnp.linalg.inv(Mcap)

        def solve_once(rhs):
            rf = (rhs * free)[:, :, None]
            rf = jnp.concatenate([rf, jnp.zeros((P - N, D, 1), dtype)])
            u = bcr_apply(factors, rf)[:N, :, 0]
            Cu = bmv(Ji, u[ei]) + bmv(Jj, u[ej])
            WCu = bmv(W, Cu).reshape(K * D)
            return (u - V @ (Mcap_inv @ WCu)) * free

    x = solve_once(b)
    for _ in range(refine_steps):
        r = b * free - matvec(sys, x, free, lam)
        x = x + solve_once(r)
    return x, n_drop
