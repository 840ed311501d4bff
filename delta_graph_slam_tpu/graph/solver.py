"""Level-masked robust LM for SE2 pose graphs (on the lm_core machinery).

Replaces g2o's OptimizationAlgorithmLevenberg + CHOLMOD for the delta
backend (GraphSLAM::optimize, /root/reference/src/hdl_graph_slam/
graph_slam.cpp:338-352). g2o semantics kept: additive SE2 updates with
angle normalization, level masking (initializeOptimization(level) keeps
edges whose level == level), fixed vertices, robust kernels via IRLS
weights.
"""

import jax
import jax.numpy as jnp

from ..geom.se2 import normalize_angle
from ..geom.dfloat import (
    DF, df_add_small, df_diff, df_normalize_angle, df_value,
)
from .lm_core import (
    SolverConfig,
    SolverStats,
    concat_sys,
    lm_optimize,
    pad_block,
)
from .robust import robust_rho, robust_weight
from .se2_graph import (
    SE2Graph,
    se2_edge_error,
    se2_prior_xy_error,
    se2_prior_yaw_error,
)

def _se2_edge_err_jac(pih, pil, pjh, pjl, meas, with_jac=True):
    """Vectorized residual + analytic jacobians of se2_edge_error on the
    double-float pose state (geom/dfloat.py).

    Closed form instead of vmapped jacfwd: the jacobian is a couple of
    rotations, so the analytic version is ~3x fewer ops on the solver's
    per-iteration hot path. e_xy = R(-th_m)(R(-th_i)(tj-ti) - t_m),
    d e_xy/d th_i = R(-th_m) [ty, -tx], d/d t_i = -R(-th_m)R(-th_i).

    Precision: the pose differences use both DF limbs (hi_j - hi_i is
    Sterbenz-exact for nearby poses, the lo difference restores the
    sub-ulp bits); cos/sin take a first-order lo correction. Everything
    downstream (jacobians, weights) is plain f32 — those errors are not
    amplified by cancellation.
    """
    dtype = pih.dtype
    E = pih.shape[0]
    dx = (pjh[:, 0] - pih[:, 0]) + (pjl[:, 0] - pil[:, 0])
    dy = (pjh[:, 1] - pih[:, 1]) + (pjl[:, 1] - pil[:, 1])
    dth = (pjh[:, 2] - pih[:, 2]) + (pjl[:, 2] - pil[:, 2])
    ch, sh = jnp.cos(pih[:, 2]), jnp.sin(pih[:, 2])
    ci = ch - pil[:, 2] * sh
    si = sh + pil[:, 2] * ch
    tx = ci * dx + si * dy
    ty = -si * dx + ci * dy
    cm, sm = jnp.cos(meas[:, 2]), jnp.sin(meas[:, 2])
    ex = cm * (tx - meas[:, 0]) + sm * (ty - meas[:, 1])
    ey = -sm * (tx - meas[:, 0]) + cm * (ty - meas[:, 1])
    eth = normalize_angle(dth - meas[:, 2])
    err = jnp.stack([ex, ey, eth], axis=1)
    if not with_jac:
        return err, None, None

    # A = R(-th_m) R(-th_i)
    a00 = cm * ci - sm * si
    a01 = cm * si + sm * ci
    a10 = -(sm * ci + cm * si)
    a11 = -sm * si + cm * ci
    # dth_i column: R(-th_m) @ [ty, -tx]
    gx = cm * ty + sm * (-tx)
    gy = -sm * ty + cm * (-tx)
    z = jnp.zeros((E,), dtype)
    one = jnp.ones((E,), dtype)
    Ji = jnp.stack([
        jnp.stack([-a00, -a01, gx], 1),
        jnp.stack([-a10, -a11, gy], 1),
        jnp.stack([z, z, -one], 1),
    ], axis=1)
    Jj = jnp.stack([
        jnp.stack([a00, a01, z], 1),
        jnp.stack([a10, a11, z], 1),
        jnp.stack([z, z, one], 1),
    ], axis=1)
    return err, Ji, Jj


def _xy_jac(pi, meas):
    E = pi.shape[0]
    J = jnp.zeros((E, 2, 3), pi.dtype)
    return J.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)


def _yaw_jac(pi, meas):
    E = pi.shape[0]
    return jnp.zeros((E, 1, 3), pi.dtype).at[:, 0, 2].set(1.0)


def _edge_families(graph: SE2Graph, state: DF, level, with_jac):
    hi, lo = state
    e = graph.edges
    r, Ji, Jj = _se2_edge_err_jac(
        hi[e.i], lo[e.i], hi[e.j], lo[e.j], e.meas, with_jac
    )
    act = e.mask & (e.level == level)
    yield e.i, e.j, r, Ji, Jj, e.info, act, e.kernel, e.delta, 3

    p = graph.priors_xy
    r = (hi[p.i, :2] - p.meas) + lo[p.i, :2]
    Ji = _xy_jac(hi[p.i], p.meas) if with_jac else None
    act = p.mask & (p.level == level)
    yield p.i, p.i, r, Ji, None, p.info, act, p.kernel, p.delta, 2

    q = graph.priors_yaw
    r = normalize_angle((hi[q.i, 2] - q.meas) + lo[q.i, 2])[:, None]
    Ji = _yaw_jac(hi[q.i], q.meas) if with_jac else None
    act = q.mask & (q.level == level)
    yield q.i, q.i, r, Ji, None, q.info.reshape(-1, 1, 1), act, q.kernel, q.delta, 1


def _chi2(graph: SE2Graph, state: DF, level):
    total = jnp.asarray(0.0, state.hi.dtype)
    nact = jnp.asarray(0, jnp.int32)
    for i, j, r, _, _, info, act, kern, delta, dim in _edge_families(
        graph, state, level, with_jac=False
    ):
        rr = r.reshape(r.shape[0], dim)
        ii = info.reshape(-1, dim, dim)
        e2 = jnp.einsum("ea,eab,eb->e", rr, ii, rr)
        rho = robust_rho(e2, kern, delta)
        total = total + jnp.sum(jnp.where(act, rho, 0.0))
        nact = nact + jnp.sum(act)
    return total, nact


def _linearize(graph: SE2Graph, state: DF, level):
    parts = []
    chi2 = jnp.asarray(0.0, state.hi.dtype)
    for i, j, r, Ji, Jj, info, act, kern, delta, dim in _edge_families(
        graph, state, level, with_jac=True
    ):
        rr = r.reshape(r.shape[0], dim)
        ii = info.reshape(-1, dim, dim)
        e2 = jnp.einsum("ea,eab,eb->e", rr, ii, rr)
        rho = robust_rho(e2, kern, delta)
        w = robust_weight(e2, kern, delta)
        chi2 = chi2 + jnp.sum(jnp.where(act, rho, 0.0))
        Wf = ii * jnp.where(act, w, 0.0)[:, None, None]
        r3, Ji3, Jj3, W3 = pad_block(rr, Ji, Jj, Wf, dim, 3)
        parts.append((i, j, r3, Ji3, Jj3, W3))
    return concat_sys(parts), chi2


def _free_mask(graph: SE2Graph, level):
    """Vertices touched by an active edge and not explicitly fixed."""
    V = graph.poses.shape[0]
    act = jnp.zeros(V, bool)
    e = graph.edges
    m = e.mask & (e.level == level)
    act = act.at[e.i].max(m)
    act = act.at[e.j].max(m)
    p = graph.priors_xy
    act = act.at[p.i].max(p.mask & (p.level == level))
    q = graph.priors_yaw
    act = act.at[q.i].max(q.mask & (q.level == level))
    free = act & ~graph.fixed & graph.vmask
    return jnp.broadcast_to(
        free.astype(graph.poses.dtype)[:, None], (V, 3)
    )


def _make_optimize(cfg: SolverConfig):
    # fused fast path: chain-first layout + df + no refine -> analytic
    # assembly with a lambda-free carry (graph/chain_lm.py); measured
    # ~3x per-iteration speedup over the generic chain path at 4k nodes
    use_fused = (cfg.backend == "chain" and cfg.chain_layout > 0
                 and cfg.chain_precision == "df"
                 and cfg.chain_refine_steps == 0)

    def opt(graph: SE2Graph, level):
        free = _free_mask(graph, level)

        if use_fused:
            from .chain_lm import lm_se2_chain

            n_total = (jnp.sum(graph.edges.mask)
                       + jnp.sum(graph.priors_xy.mask)
                       + jnp.sum(graph.priors_yaw.mask))
            state, stats = lm_se2_chain(graph, level, free, cfg, n_total)
            return df_value(state), stats

        def linearize_fn(state):
            return _linearize(graph, state, level)

        def chi2_fn(state):
            return _chi2(graph, state, level)

        def apply_fn(state, dx):
            out = df_add_small(state, dx)
            th = df_normalize_angle(DF(out.hi[:, 2], out.lo[:, 2]))
            return DF(out.hi.at[:, 2].set(th.hi), out.lo.at[:, 2].set(th.lo))

        n_total = (jnp.sum(graph.edges.mask) + jnp.sum(graph.priors_xy.mask)
                   + jnp.sum(graph.priors_yaw.mask))
        state0 = DF(graph.poses, jnp.zeros_like(graph.poses))
        state, stats = lm_optimize(
            linearize_fn, chi2_fn, apply_fn, state0, free, cfg,
            n_edges_total=n_total,
        )
        return df_value(state), stats

    return opt


_OPT_CACHE = {}


# segment count for the auto-selected locality-aware SPIKE solve; p=16
# measured fastest at both 4k and 16k nodes on TPU v5e
# (scripts/profile_inloop.py: 1.75 ms vs 2.72 plain at 4k/K32,
# 6.07 ms vs 27.6 plain at 16k/K128).
SPIKE_AUTO_P = 16
# below this vertex capacity the plain chain solve's single BCR is
# already cheap and the segmented form only adds reduction overhead
SPIKE_AUTO_MIN_N = 2048
# above this per-segment slot need the local sweep is wider than the
# problem is sparse — keep the global Woodbury instead
SPIKE_AUTO_MAX_LC = 128


def optimize_se2(graph: SE2Graph, level=0, config: SolverConfig = None,
                 off_hint=None, n_chain=0, local_hint=None):
    """Optimize the graph at the given level; returns (poses, SolverStats).

    Mirrors GraphSLAM::optimize(num_iterations, level)
    (graph_slam.cpp:338-352) including the <min_edges skip.

    off_hint: host-known count of off-chain edges (loop closures etc.)
    for the chain backend. The Woodbury capacity is bucketed to the next
    power of two >= the hint — small graphs stop paying for 128 slots,
    and graphs with MORE off-chain edges than the configured capacity
    are solved with an enlarged capacity instead of silently dropping
    them (SolverStats.n_offchain_dropped reports any overflow).

    n_chain: pass graph.poses.shape[0] - 1 when the graph was packed
    with to_arrays(chain_first=True); the chain backend then assembles
    the block tridiagonal and gradient with shifts instead of scatters.

    local_hint: host-known max per-segment endpoint-slot need
    (SE2GraphBuilder.spike_local_need(N, level, p=SPIKE_AUTO_P)). When
    given — and the caller didn't configure chain_segments explicitly —
    large graphs are routed through the locality-aware SPIKE solve
    (parallel/spike.py) with Lc bucketed to the hint: the wide
    [b | U | C^T] double-float BCR apply that dominates big-graph
    iterations collapses to per-segment local sweeps (measured 2.6x
    whole-solver at 16k, identical chi2/ATE).
    """
    import dataclasses as _dc

    config = config or SolverConfig()
    if n_chain and config.backend == "chain" \
            and n_chain != config.chain_layout:
        config = _dc.replace(config, chain_layout=n_chain)
    if off_hint is not None and config.backend == "chain":
        k = 8
        while k < off_hint:
            if (k // 2) * 3 >= off_hint:
                k = (k // 2) * 3
                break
            k *= 2
        if k != config.chain_offrank_capacity:
            config = _dc.replace(config, chain_offrank_capacity=k)
    if (local_hint is not None and config.backend == "chain"
            and config.chain_segments == 0 and off_hint
            and graph.poses.shape[0] >= SPIKE_AUTO_MIN_N):
        lc = 8
        while lc < local_hint:
            lc *= 2
        if lc <= SPIKE_AUTO_MAX_LC:
            config = _dc.replace(config, chain_segments=SPIKE_AUTO_P,
                                 chain_local_cols=lc)
    if config not in _OPT_CACHE:
        _OPT_CACHE[config] = jax.jit(_make_optimize(config))
    return _OPT_CACHE[config](graph, jnp.asarray(level, jnp.int32))
