"""Generic block-sparse Levenberg-Marquardt machinery.

Shared by the SE2 (3-dim blocks) and SE3 (6-dim unified pose/plane/point
blocks) solvers. The Hessian is never materialized in the 'cg' backend:
H x = sum_e J_e^T W_e J_e x runs as gather -> DxD matmuls -> segment-sum,
with block-Jacobi preconditioned CG. A 'dense' backend assembles (N*D, N*D)
for small graphs and verification.

LM schedule follows g2o's OptimizationAlgorithmLevenberg: initial lambda =
tau * max diag(H); accept/reject by chi2 with gain-ratio lambda updates.
"""

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    backend: str = "cg"          # 'cg' | 'chain' | 'dense'
    max_iterations: int = 100    # LM outer iterations (early-stopped)
    # truncated-Newton point: 50 iters / 1e-5 converges LM to the same
    # optimum as exact solves at ~2x the speed (TPU CG is latency-bound)
    cg_max_iters: int = 50
    cg_rtol: float = 1e-5
    lm_tau: float = 1e-5
    min_edges: int = 10          # g2o facade skips tiny graphs (graph_slam.cpp:340)
    chi2_rel_tol: float = 1e-10
    dx_tol: float = 1e-12
    # 'chain' backend (graph/chain_solve.py): direct block-cyclic-reduction
    # solve of the odometry chain + Woodbury correction for up to
    # chain_offrank_capacity off-chain edges (loops). Off-chain overflow
    # degrades gracefully: the refine steps turn the solve into a
    # chain-preconditioned Richardson iteration on the full Hessian.
    # refine 0: inside LM the ~1e-2 f32 step error is immaterial (the
    # accept test re-evaluates chi2; measured identical convergence) —
    # use refine_steps>=1 for standalone solves needing tight dx.
    chain_offrank_capacity: int = 128
    chain_base_blocks: int = 16
    chain_refine_steps: int = 0
    # "df" runs the BCR elimination in double-float (two-f32): a SLAM
    # chain has kappa ~ N^2, so f32 elimination produces garbage steps
    # at production sizes once LM's lambda gets small (measured 272%
    # step error at 4k nodes). "f32" is only safe for small graphs.
    chain_precision: str = "df"
    # > 0 opts into the chain-first edge-table layout
    # (SE2GraphBuilder.to_arrays(chain_first=True)): rows [0..layout-1]
    # are guaranteed to be the consecutive odometry edges (row k <->
    # vertices (k, k+1)), letting gradient and tridiagonal assembly use
    # shifts instead of scatters (the dominant per-iter cost at 4k+).
    # Set via optimize_se2(..., n_chain=...); ONLY valid with that layout.
    chain_layout: int = 0
    # > 0 routes the chain backend through the hub-elimination solve
    # (graph/hub_solve.py): the LAST chain_hubs vertices of the unified
    # space are treated as hub vertices (SE3 floor planes / landmarks),
    # eliminated exactly via their small dense block; their couplings
    # join the loop edges in one generalized Woodbury capacitance.
    # optimize_se3 sets this automatically for backend="chain".
    chain_hubs: int = 0
    # capacity for pose<->hub coupling edges in the hub solve (one per
    # keyframe-with-floor in the hdl pipeline)
    chain_coupling_capacity: int = 4096
    # > 1 splits the chain into that many segments solved with the SPIKE
    # substructuring (parallel/spike.py): per-segment df BCR batched over
    # the segment axis, interfaces + loops in one Woodbury capacitance.
    # Numerically identical to the single-chip chain solve; set to the
    # mesh axis size (with chain_mesh_axis) for a sharded direct solve.
    chain_segments: int = 0
    # mesh axis name the segment dimension is sharding-constrained to
    # (None = run the batched form unsharded)
    chain_mesh_axis: str = None
    # > 0 (with chain_segments > 1) routes the segmented solve through
    # the locality-aware Woodbury (parallel/spike.py
    # spike_local_solve_df): each segment sweeps its BCR factor over
    # [b | its 2 interfaces | up to chain_local_cols endpoint slots]
    # instead of the full [b | U | C^T] — the wide df apply that
    # dominates large-graph iterations. Size to ~2 * ceil(2K/p); edges
    # whose endpoints overflow a segment's slots are dropped from the
    # correction (counted in n_offchain_dropped).
    chain_local_cols: int = 0


class SolverStats(NamedTuple):
    chi2_initial: jnp.ndarray
    chi2_final: jnp.ndarray
    iterations: jnp.ndarray
    lambda_final: jnp.ndarray
    num_active_edges: jnp.ndarray
    # chain backend: active off-chain edges beyond the Woodbury capacity
    # (0 elsewhere). Non-zero means the solve dropped couplings — pass a
    # bigger off_hint / chain_offrank_capacity (ADVICE r2).
    n_offchain_dropped: jnp.ndarray = None


def bmm(a, b):
    """Batched small-matrix product as broadcast multiply + sum.

    (...,m,k) @ (...,k,n) -> (...,m,n). For the tiny (E,3,3)-class blocks
    of a pose graph, lowering to the MXU is all padding and pass count
    (HIGHEST f32 = 6 bf16 passes = 6 kernels per product); the broadcast
    form fuses to one full-f32 VPU kernel instead.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def bmv(a, v):
    """Batched matrix-vector: (...,m,k) @ (...,k) -> (...,m)."""
    return jnp.sum(a * v[..., None, :], axis=-1)


class LinSys(NamedTuple):
    """Unified padded block edge table (unary edges have Jj = 0, j = i)."""

    i: jnp.ndarray    # (E,)
    j: jnp.ndarray    # (E,)
    r: jnp.ndarray    # (E,D)
    Ji: jnp.ndarray   # (E,D,D)
    Jj: jnp.ndarray   # (E,D,D)
    W: jnp.ndarray    # (E,D,D) robust-weighted information (0 if inactive)


def pad_block(r, Ji, Jj, W, rdim, D):
    """Pad an rdim-residual edge family to DxD blocks."""
    E = r.shape[0]
    dtype = r.dtype
    r = r.reshape(E, rdim)
    Ji = Ji.reshape(E, rdim, -1)
    di = Ji.shape[-1]
    rD = jnp.zeros((E, D), dtype).at[:, :rdim].set(r)
    JiD = jnp.zeros((E, D, D), dtype).at[:, :rdim, :di].set(Ji)
    if Jj is None:
        JjD = jnp.zeros((E, D, D), dtype)
    else:
        Jj = Jj.reshape(E, rdim, -1)
        dj = Jj.shape[-1]
        JjD = jnp.zeros((E, D, D), dtype).at[:, :rdim, :dj].set(Jj)
    WD = jnp.zeros((E, D, D), dtype).at[:, :rdim, :rdim].set(
        W.reshape(E, rdim, rdim)
    )
    return rD, JiD, JjD, WD


def concat_sys(parts):
    return LinSys(*(jnp.concatenate([p[k] for p in parts]) for k in range(6)))


def gradient(sys: LinSys, N, n_chain=0):
    """b = sum J^T W r, scattered per vertex. Returns (N,D).

    n_chain > 0: rows [0..n_chain-1] follow the chain-first layout
    (row k <-> vertices {k, k+1}, either stored orientation); their
    contributions land via shifts instead of scatters (see
    chain_solve.assemble_tridiag_df_chain)."""
    Wr = bmv(sys.W, sys.r)
    bi = bmv(jnp.swapaxes(sys.Ji, 1, 2), Wr)
    bj = bmv(jnp.swapaxes(sys.Jj, 1, 2), Wr)
    if n_chain:
        D = bi.shape[1]
        # slot k may store the edge as (k, k+1) or reversed (k+1, k)
        rev = (sys.i[:n_chain] > sys.j[:n_chain])[:, None]
        top = jnp.where(rev, bj[:n_chain], bi[:n_chain])   # at vertex k
        bot = jnp.where(rev, bi[:n_chain], bj[:n_chain])   # at vertex k+1
        z = jnp.zeros((N - n_chain, D), bi.dtype)
        z1 = jnp.zeros((1, D), bi.dtype)
        b = jnp.concatenate([top, z])
        b = b + jnp.concatenate([z1, bot,
                                 jnp.zeros((N - n_chain - 1, D), bi.dtype)])
        b = b + jax.ops.segment_sum(bi[n_chain:], sys.i[n_chain:],
                                    num_segments=N)
        return b + jax.ops.segment_sum(bj[n_chain:], sys.j[n_chain:],
                                       num_segments=N)
    b = jax.ops.segment_sum(bi, sys.i, num_segments=N)
    return b + jax.ops.segment_sum(bj, sys.j, num_segments=N)


def diag_blocks(sys: LinSys, N):
    """Block-diagonal of H. Returns (N,D,D)."""
    WJi = bmm(sys.W, sys.Ji)
    WJj = bmm(sys.W, sys.Jj)
    Dii = bmm(jnp.swapaxes(sys.Ji, 1, 2), WJi)
    Djj = bmm(jnp.swapaxes(sys.Jj, 1, 2), WJj)
    Db = jax.ops.segment_sum(Dii, sys.i, num_segments=N)
    return Db + jax.ops.segment_sum(Djj, sys.j, num_segments=N)


def matvec(sys: LinSys, x, free, lam):
    """(H + lam I) x with per-dim free-mask projection. x, free: (N,D)."""
    xf = x * free
    yi = bmv(sys.Ji, xf[sys.i])
    yj = bmv(sys.Jj, xf[sys.j])
    Wy = bmv(sys.W, yi + yj)
    zi = bmv(jnp.swapaxes(sys.Ji, 1, 2), Wy)
    zj = bmv(jnp.swapaxes(sys.Jj, 1, 2), Wy)
    z = jax.ops.segment_sum(zi, sys.i, num_segments=x.shape[0])
    z = z + jax.ops.segment_sum(zj, sys.j, num_segments=x.shape[0])
    return (z + lam * xf) * free


def block_jacobi_inverse(Dblocks, free, lam):
    """Inverse of (diag blocks + lam I) with masked dims neutralized."""
    D = Dblocks.shape[-1]
    eye = jnp.eye(D, dtype=Dblocks.dtype)
    # masked dims -> identity rows/cols so the inverse exists
    fm = free[..., None] * free[..., None, :]
    A = Dblocks * fm + (1.0 - fm) * eye + lam * eye
    Minv = jnp.linalg.inv(A)
    return Minv * fm


def cg_solve(sys: LinSys, b, free, lam, Minv, max_iters, rtol):
    """Block-Jacobi preconditioned CG on (H + lam I) x = b."""
    bf = b * free
    bnorm2 = jnp.sum(bf * bf)
    tol2 = rtol * rtol * jnp.maximum(bnorm2, 1e-30)

    def apply_Minv(r):
        return (Minv @ r[..., None])[..., 0] * free

    x0 = jnp.zeros_like(b)
    r0 = bf
    z0 = apply_Minv(r0)
    rz0 = jnp.sum(r0 * z0)

    def cond(state):
        _, r, _, _, k = state
        return (jnp.sum(r * r) > tol2) & (k < max_iters)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(sys, p, free, lam)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_Minv(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x


def dense_solve(sys: LinSys, b, free, lam):
    """Materialized (N*D, N*D) solve for small graphs / verification."""
    N, D = b.shape
    dtype = b.dtype
    WJi = sys.W @ sys.Ji
    WJj = sys.W @ sys.Jj
    Hii = jnp.swapaxes(sys.Ji, 1, 2) @ WJi
    Hij = jnp.swapaxes(sys.Ji, 1, 2) @ WJj
    Hji = jnp.swapaxes(sys.Jj, 1, 2) @ WJi
    Hjj = jnp.swapaxes(sys.Jj, 1, 2) @ WJj
    H = jnp.zeros((N * D, N * D), dtype)
    a = jnp.arange(D)

    def rows(v):
        return D * v[:, None, None] + a[None, :, None]

    def cols(v):
        return D * v[:, None, None] + a[None, None, :]

    H = H.at[rows(sys.i), cols(sys.i)].add(Hii)
    H = H.at[rows(sys.i), cols(sys.j)].add(Hij)
    H = H.at[rows(sys.j), cols(sys.i)].add(Hji)
    H = H.at[rows(sys.j), cols(sys.j)].add(Hjj)
    freev = free.reshape(-1)
    H = H * freev[:, None] * freev[None, :] + jnp.diag(
        jnp.where(freev > 0, lam, 1.0)
    )
    bf = b.reshape(-1) * freev
    x = jnp.linalg.solve(H, bf)
    return x.reshape(N, D) * free


def lm_optimize(linearize_fn, chi2_fn, apply_fn, state0, free, cfg: SolverConfig,
                n_edges_total=None):
    """Generic robust LM loop.

    linearize_fn(state) -> (LinSys, chi2); chi2_fn(state) -> (chi2, n_active);
    apply_fn(state, dx (N,D)) -> state. ``free`` (N,D) float mask.

    n_edges_total: edge count used for the g2o min_edges skip. The
    reference checks the WHOLE graph's edge count before the level-masked
    initializeOptimization (graph_slam.cpp:338-346), so a 2-edge level-2
    de-overlap solve still runs when the full graph is big enough — pass
    the unmasked count here. Defaults to the level-active count (the old,
    stricter behavior) when None.
    """
    N = free.shape[0]
    dtype = free.dtype
    chi2_0, nact = chi2_fn(state0)
    skip = (nact if n_edges_total is None else n_edges_total) < cfg.min_edges

    sys0, _ = linearize_fn(state0)
    D0 = diag_blocks(sys0, N)
    maxdiag = jnp.max(jnp.abs(jnp.einsum("vaa->va", D0)) * free)
    lam0 = (cfg.lm_tau * jnp.maximum(maxdiag, 1e-12)).astype(dtype)

    # The loop carries the linearization at the current state: each
    # iteration runs exactly ONE linearize (at the trial point, whose
    # robust chi2 falls out for free) instead of linearize(state) +
    # a separate residual pass for chi2(trial).
    n_chain = cfg.chain_layout if cfg.backend == "chain" else 0

    def lm_step(carry):
        state, sys, lam, nu, chi2, it, _ = carry
        b = gradient(sys, N, n_chain=n_chain)
        if cfg.backend == "dense":
            dx = dense_solve(sys, -b, free, lam)
        elif cfg.backend == "chain" and cfg.chain_hubs > 0:
            from .hub_solve import chain_hub_solve

            dx, _ = chain_hub_solve(
                sys, -b, free, lam, N,
                n_hub=cfg.chain_hubs,
                K_cap=cfg.chain_offrank_capacity,
                coup_cap=cfg.chain_coupling_capacity,
            )
        elif cfg.backend == "chain":
            from .chain_solve import chain_solve

            dx, _ = chain_solve(
                sys, -b, free, lam, N,
                K_cap=cfg.chain_offrank_capacity,
                base_blocks=cfg.chain_base_blocks,
                refine_steps=cfg.chain_refine_steps,
                precision=cfg.chain_precision,
                n_chain=n_chain,
            )
        else:
            Db = diag_blocks(sys, N)
            Minv = block_jacobi_inverse(Db, free, lam)
            dx = cg_solve(sys, -b, free, lam, Minv, cfg.cg_max_iters, cfg.cg_rtol)
        trial = apply_fn(state, dx)
        sys_t, chi2_t = linearize_fn(trial)
        denom = jnp.sum(dx * (lam * dx - b))
        rho = (chi2 - chi2_t) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        finite = jax.tree_util.tree_reduce(
            lambda acc, x: acc & jnp.all(jnp.isfinite(x)), trial, jnp.asarray(True)
        )
        accept = (chi2_t < chi2) & finite
        state_n = jax.tree_util.tree_map(
            lambda t, s: jnp.where(accept, t, s), trial, state
        )
        sys_n = jax.tree_util.tree_map(
            lambda t, s: jnp.where(accept, t, s), sys_t, sys
        )
        chi2_n = jnp.where(accept, chi2_t, chi2)
        lam_dec = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_n = jnp.where(accept, lam_dec, lam * nu).astype(dtype)
        nu_n = jnp.where(accept, 2.0, nu * 2.0).astype(dtype)
        # termination: accepted step with negligible gain, or a step so
        # small no progress is possible. The dx test applies on REJECTED
        # steps too: near the optimum every trial is rejected and dx
        # shrinks ~1/lambda — without it the loop walks lambda all the
        # way to 1e12 (~56 useless 47 ms iterations per warm-started
        # cycle, the hdl backend's 3 s-cadence regime).
        converged = (
            accept
            & ((chi2 - chi2_n) <= cfg.chi2_rel_tol * jnp.maximum(chi2, 1e-30))
        ) | (jnp.sum(dx * dx) < cfg.dx_tol)
        return state_n, sys_n, lam_n, nu_n, chi2_n, it + 1, converged

    def cond(carry):
        _, _, lam, _, _, it, done = carry
        return (~done) & (it < cfg.max_iterations) & (lam < 1e12) & (~skip)

    init = (
        state0, sys0, lam0, jnp.asarray(2.0, dtype), chi2_0,
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
    )
    state, _, lam, nu, chi2, iters, _ = jax.lax.while_loop(cond, lm_step, init)
    if cfg.backend == "chain" and cfg.chain_hubs > 0:
        from .hub_solve import hub_overflow

        n_drop = hub_overflow(sys0, free, N, cfg.chain_hubs,
                              cfg.chain_offrank_capacity,
                              cfg.chain_coupling_capacity)
    elif cfg.backend == "chain":
        from .chain_solve import offchain_overflow

        n_drop = offchain_overflow(sys0, free, cfg.chain_offrank_capacity)
    else:
        n_drop = jnp.asarray(0, jnp.int32)
    stats = SolverStats(
        chi2_initial=chi2_0,
        chi2_final=chi2,
        iterations=jnp.where(skip, -1, iters),
        lambda_final=lam,
        num_active_edges=nact,
        n_offchain_dropped=n_drop,
    )
    return state, stats
