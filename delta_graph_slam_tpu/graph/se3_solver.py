"""Robust LM for the SE3 graph (poses + plane + point landmarks).

Vertices live in one unified 6-dim block space (planes/points use the first
3 dims, the rest masked) so the lm_core machinery applies unchanged.
Jacobians are exact: forward-mode autodiff of each edge error through the
vertex-local update maps (right-multiplicative se3 exp for poses, g2o
Plane3D::oplus for planes, additive for points) evaluated at zero.

Precision: pose translations and point landmarks are carried as
double-float (hi, lo) pairs (geom/dfloat.py) — at KITTI scale (|t| ~
300 m) one f32 ulp is ~3e-5 m, so plain-f32 state swallows late LM
updates and the residual differences t_j - t_i cancel catastrophically
(the NOTES_r3 SE2 failure, reproduced verbatim on SE3: the r3 bench
stalled at chi2 5.9e6 where the f64 optimum is 2.02). Because the
translation enters every edge error LINEARLY once the rotations are
fixed, the lo limb contributes an exact closed-form correction per
family (e.g. EdgeSE3: Rz^T Ri^T (lo_j - lo_i)); quaternions and plane
coefficients are O(1) and stay plain f32. Jacobians, robust weights and
the (already double-float) hub-elimination solve are unchanged.

Replaces g2o lm_var_cholmod for the SE3/hdl capability set
(/root/reference/src/hdl_graph_slam/graph_slam.cpp:31-76, 338-352).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geom.dfloat import DF, df_add_small, df_value
from ..geom.se3 import quat_to_rot
from .lm_core import (
    SolverConfig,
    concat_sys,
    lm_optimize,
    pad_block,
)
from .robust import robust_rho, robust_weight
from .se3_graph import (
    SE3Graph,
    error_plane_identity,
    error_plane_parallel,
    error_plane_perpendicular,
    error_plane_prior_distance,
    error_plane_prior_normal,
    error_se3,
    error_se3_plane,
    error_se3_point,
    error_se3_prior_quat,
    error_se3_prior_vec,
    error_se3_prior_xy,
    error_se3_prior_xyz,
    plane_oplus,
    pose7_oplus,
)


# delta-parameterized error functions (autodiff at delta = 0) -------------

def _f_se3(da, db, pi, pj, meas):
    return error_se3(pose7_oplus(pi, da), pose7_oplus(pj, db), meas)


def _f_prior(err_fn, da, pi, meas):
    return err_fn(pose7_oplus(pi, da), meas)


def _f_se3_plane(da, db, pi, pl, meas):
    return error_se3_plane(pose7_oplus(pi, da), plane_oplus(pl, db), meas)


def _f_se3_point(da, db, pi, pt, meas):
    return error_se3_point(pose7_oplus(pi, da), pt + db, meas)


def _f_pp(da, db, p1, p2, meas, kind):
    a = plane_oplus(p1, da)
    b = plane_oplus(p2, db)
    e_id = error_plane_identity(a, b, meas)
    e_par = jnp.concatenate([error_plane_parallel(a, b, meas[:3]),
                             jnp.zeros((1,), a.dtype)])
    e_perp = jnp.concatenate([error_plane_perpendicular(a, b, meas),
                              jnp.zeros((3,), a.dtype)])
    return jnp.where(kind == 0, e_id, jnp.where(kind == 1, e_par, e_perp))


def _f_pprior(da, p, meas, kind):
    a = plane_oplus(p, da)
    e_n = error_plane_prior_normal(a, meas)
    e_d = jnp.concatenate([error_plane_prior_distance(a, meas[0]),
                           jnp.zeros((2,), a.dtype)])
    return jnp.where(kind == 0, e_n, e_d)


_j_se3 = jax.vmap(jax.jacfwd(_f_se3, argnums=(0, 1)))
_r_se3 = jax.vmap(_f_se3)
_j_se3_plane = jax.vmap(jax.jacfwd(_f_se3_plane, argnums=(0, 1)))
_r_se3_plane = jax.vmap(_f_se3_plane)
_j_se3_point = jax.vmap(jax.jacfwd(_f_se3_point, argnums=(0, 1)))
_r_se3_point = jax.vmap(_f_se3_point)
_j_pp = jax.vmap(jax.jacfwd(_f_pp, argnums=(0, 1)))
_r_pp = jax.vmap(_f_pp)
_j_pprior = jax.vmap(jax.jacfwd(_f_pprior, argnums=0))
_r_pprior = jax.vmap(_f_pprior)

_PRIORS = {
    "xy": (error_se3_prior_xy, 2),
    "xyz": (error_se3_prior_xyz, 3),
    "vec": (error_se3_prior_vec, 3),
    "quat": (error_se3_prior_quat, 3),
}
_prior_fns = {
    k: (
        jax.vmap(functools.partial(_f_prior, fn)),
        jax.vmap(jax.jacfwd(functools.partial(_f_prior, fn), argnums=0)),
        dim,
    )
    for k, (fn, dim) in _PRIORS.items()
}


def _z(n, d, dtype):
    return jnp.zeros((n, d), dtype)


def _families(graph: SE3Graph, state, with_jac):
    """Yield (gi, gj, r, Ji, Jj, info, act, kernel, delta, rdim) with global
    vertex indices over the unified [poses | planes | points] space.

    state = (poses DF (V,7), planes (P,4), points DF (Q,3)). Base
    residuals and all Jacobians evaluate at the hi limb; the lo limb
    (nonzero only on translations/points) adds its exact linear
    contribution to each residual."""
    poses_df, planes, points_df = state
    poses = poses_df.hi
    tlo = poses_df.lo[:, :3]
    points = points_df.hi
    V = poses.shape[0]
    P = planes.shape[0]
    dt = poses.dtype

    e = graph.edges
    n = e.i.shape[0]
    r = _r_se3(_z(n, 6, dt), _z(n, 6, dt), poses[e.i], poses[e.j], e.meas)
    # d r_t / d t_j = Rz^T Ri^T (translation is linear given rotations)
    RiT = jnp.swapaxes(quat_to_rot(poses[e.i, 3:7]), -1, -2)
    RzT = jnp.swapaxes(quat_to_rot(e.meas[:, 3:7]), -1, -2)
    dlo = tlo[e.j] - tlo[e.i]
    corr = jnp.einsum("eab,ebc,ec->ea", RzT, RiT, dlo)
    r = r.at[:, :3].add(corr)
    Ji, Jj = (_j_se3(_z(n, 6, dt), _z(n, 6, dt), poses[e.i], poses[e.j], e.meas)
              if with_jac else (None, None))
    yield e.i, e.j, r, Ji, Jj, e.info, e.mask, e.level, e.kernel, e.delta, 6

    for name in ("xy", "xyz", "vec", "quat"):
        p = getattr(graph, f"priors_{name}")
        r_fn, j_fn, dim = _prior_fns[name]
        n = p.i.shape[0]
        r = r_fn(_z(n, 6, dt), poses[p.i], p.meas)
        if name == "xy":
            r = r + tlo[p.i, :2]
        elif name == "xyz":
            r = r + tlo[p.i]
        Ji = j_fn(_z(n, 6, dt), poses[p.i], p.meas) if with_jac else None
        yield p.i, p.i, r, Ji, None, p.info, p.mask, p.level, p.kernel, p.delta, dim

    s = graph.se3_plane
    n = s.i.shape[0]
    gp = V + s.p
    r = _r_se3_plane(_z(n, 6, dt), _z(n, 3, dt), poses[s.i], planes[s.p], s.meas)
    # local plane offset w' = w + t.n (transform_plane with T^-1), and the
    # ominus d-component is -w' - (-w_meas): d(err_d)/dt = -n
    r = r.at[:, 2].add(-jnp.sum(tlo[s.i] * planes[s.p, :3], axis=-1))
    Ji, Jj = (_j_se3_plane(_z(n, 6, dt), _z(n, 3, dt), poses[s.i], planes[s.p], s.meas)
              if with_jac else (None, None))
    yield s.i, gp, r, Ji, Jj, s.info, s.mask, s.level, s.kernel, s.delta, 3

    t = graph.se3_point
    n = t.i.shape[0]
    gq = V + P + t.q
    r = _r_se3_point(_z(n, 6, dt), _z(n, 3, dt), poses[t.i], points[t.q], t.meas)
    # err = Ri^T (p - t_i) - meas: lo correction Ri^T (p_lo - t_lo)
    RiTp = jnp.swapaxes(quat_to_rot(poses[t.i, 3:7]), -1, -2)
    r = r + jnp.einsum("eab,eb->ea", RiTp, points_df.lo[t.q] - tlo[t.i])
    Ji, Jj = (_j_se3_point(_z(n, 6, dt), _z(n, 3, dt), poses[t.i], points[t.q], t.meas)
              if with_jac else (None, None))
    yield t.i, gq, r, Ji, Jj, t.info, t.mask, t.level, t.kernel, t.delta, 3

    w = graph.plane_plane
    n = w.a.shape[0]
    ga, gb = V + w.a, V + w.b
    r = _r_pp(_z(n, 3, dt), _z(n, 3, dt), planes[w.a], planes[w.b], w.meas, w.kind)
    Ji, Jj = (_j_pp(_z(n, 3, dt), _z(n, 3, dt), planes[w.a], planes[w.b], w.meas, w.kind)
              if with_jac else (None, None))
    yield ga, gb, r, Ji, Jj, w.info, w.mask, w.level, w.kernel, w.delta, 4

    u = graph.plane_priors
    n = u.p.shape[0]
    gp = V + u.p
    r = _r_pprior(_z(n, 3, dt), planes[u.p], u.meas, u.kind)
    Ji = _j_pprior(_z(n, 3, dt), planes[u.p], u.meas, u.kind) if with_jac else None
    yield gp, gp, r, Ji, None, u.info, u.mask, u.level, u.kernel, u.delta, 3


def _chi2(graph, state, level):
    total = jnp.asarray(0.0, state[0].hi.dtype)
    nact = jnp.asarray(0, jnp.int32)
    for gi, gj, r, _, _, info, mask, lvl, kern, delta, dim in _families(
        graph, state, with_jac=False
    ):
        act = mask & (lvl == level)
        rr = r.reshape(r.shape[0], -1)[:, :dim]
        ii = info.reshape(-1, info.shape[-1], info.shape[-1])[:, :dim, :dim]
        e2 = jnp.einsum("ea,eab,eb->e", rr, ii, rr)
        rho = robust_rho(e2, kern, delta)
        total = total + jnp.sum(jnp.where(act, rho, 0.0))
        nact = nact + jnp.sum(act)
    return total, nact


def _linearize(graph, state, level):
    parts = []
    chi2 = jnp.asarray(0.0, state[0].hi.dtype)
    for gi, gj, r, Ji, Jj, info, mask, lvl, kern, delta, dim in _families(
        graph, state, with_jac=True
    ):
        act = mask & (lvl == level)
        rr = r.reshape(r.shape[0], -1)[:, :dim]
        ii = info.reshape(-1, info.shape[-1], info.shape[-1])[:, :dim, :dim]
        e2 = jnp.einsum("ea,eab,eb->e", rr, ii, rr)
        rho = robust_rho(e2, kern, delta)
        w = robust_weight(e2, kern, delta)
        chi2 = chi2 + jnp.sum(jnp.where(act, rho, 0.0))
        Wf = ii * jnp.where(act, w, 0.0)[:, None, None]
        Jic = Ji[:, :dim, :] if Ji is not None else None
        Jjc = Jj[:, :dim, :] if Jj is not None else None
        r6, Ji6, Jj6, W6 = pad_block(rr, Jic, Jjc, Wf, dim, 6)
        parts.append((gi.astype(jnp.int32), gj.astype(jnp.int32), r6, Ji6, Jj6, W6))
    return concat_sys(parts), chi2


def _state0(graph: SE3Graph):
    return (DF(graph.poses, jnp.zeros_like(graph.poses)),
            graph.planes,
            DF(graph.points, jnp.zeros_like(graph.points)))


def _free_mask(graph: SE3Graph, level):
    V = graph.poses.shape[0]
    P = graph.planes.shape[0]
    Q = graph.points.shape[0]
    N = V + P + Q
    act = jnp.zeros(N, bool)
    state = _state0(graph)
    for gi, gj, *_rest in _families(graph, state, with_jac=False):
        mask, lvl = _rest[4], _rest[5]
        m = mask & (lvl == level)
        act = act.at[gi].max(m)
        act = act.at[gj].max(m)
    fixed = jnp.concatenate([graph.fixed, graph.plane_fixed, graph.point_fixed])
    alloc = jnp.concatenate([graph.vmask, graph.plane_mask, graph.point_mask])
    free = act & ~fixed & alloc
    dimmask = jnp.concatenate(
        [
            jnp.ones((V, 6), bool),
            jnp.zeros((P, 6), bool).at[:, :3].set(True),
            jnp.zeros((Q, 6), bool).at[:, :3].set(True),
        ]
    )
    return (free[:, None] & dimmask).astype(graph.poses.dtype)


def _make_optimize(cfg: SolverConfig):
    def opt(graph: SE3Graph, level):
        # SE3 linearization is built from 3x3/4x4 rotation-matrix products
        # (error_se3, pose7_oplus jacfwd): at the TPU's default matmul
        # precision those run as bf16 passes, whose ~1e-3 relative noise
        # on residuals/jacobians stalls LM far from the optimum (measured
        # r4: chi2 5.8e6 at default vs 1.39 at highest on the 4k bench;
        # the SE2 solver is immune because its analytic forms avoid
        # dot_general entirely). f32-highest = 6 bf16 passes; the solve
        # itself (hub_solve) already pins highest internally.
        with jax.default_matmul_precision("highest"):
            return _opt_body(graph, level)

    def _opt_body(graph: SE3Graph, level):
        V = graph.poses.shape[0]
        P = graph.planes.shape[0]
        free = _free_mask(graph, level)
        state0 = _state0(graph)

        def linearize_fn(state):
            return _linearize(graph, state, level)

        def chi2_fn(state):
            return _chi2(graph, state, level)

        def apply_fn(state, dx):
            poses_df, planes, points_df = state
            dxp = dx[:V]
            # orientation: plain f32 right-multiplicative update (unit
            # quats have no cancellation); translation: the world-frame
            # increment delta_t = R V(w) v is O(|dx|), accumulated in df
            # so sub-ulp steps are not swallowed at |t| ~ 300 m
            from ..geom.se3 import se3_exp

            E = se3_exp(dxp)
            q_new = pose7_oplus(poses_df.hi, dxp)[:, 3:7]
            Rhi = quat_to_rot(poses_df.hi[:, 3:7])
            delta_t = jnp.einsum("vab,vb->va", Rhi, E[:, :3, 3])
            t_new = df_add_small(DF(poses_df.hi[:, :3], poses_df.lo[:, :3]),
                                 delta_t)
            poses_df = DF(
                jnp.concatenate([t_new.hi, q_new], axis=-1),
                jnp.concatenate([t_new.lo, jnp.zeros_like(q_new)], axis=-1),
            )
            planes = plane_oplus(planes, dx[V:V + P, :3])
            points_df = df_add_small(points_df, dx[V + P:, :3])
            return (poses_df, planes, points_df)

        n_total = jnp.asarray(0, jnp.int32)
        for _rest in _families(graph, state0, with_jac=False):
            n_total = n_total + jnp.sum(_rest[6])
        (poses_df, planes, points_df), stats = lm_optimize(
            linearize_fn, chi2_fn, apply_fn, state0, free, cfg,
            n_edges_total=n_total)
        return (df_value(poses_df), planes, df_value(points_df)), stats

    return opt


_OPT_CACHE = {}


def optimize_se3(graph: SE3Graph, level=0, config: SolverConfig = None,
                 offrank_floor: int = 0):
    """Optimize; returns ((poses, planes, points), SolverStats).

    backend="chain" routes through the hub-elimination direct solve
    (graph/hub_solve.py): poses form the BCR chain, every plane/point
    slot is a hub vertex eliminated via its small dense block.
    offrank_floor: minimum loop-edge (Woodbury) capacity — long-running
    backends preallocate it so loop-closure growth reuses one compiled
    program instead of recompiling at each pow2 bump."""
    config = config or SolverConfig()
    if config.backend == "chain":
        import numpy as np

        n_hub = graph.planes.shape[0] + graph.points.shape[0]
        # coupling capacity: every pose<->hub edge comes from the
        # se3_plane / se3_point tables, so their (static) capacities are
        # an exact bound. Loop capacity: host-counted off-chain se3
        # edges, pow2-bucketed so graph growth reuses compiled programs.
        coup_cap = (graph.se3_plane.i.shape[0]
                    + graph.se3_point.i.shape[0])
        ei = np.asarray(graph.edges.i)
        ej = np.asarray(graph.edges.j)
        em = np.asarray(graph.edges.mask)
        n_off = int(np.sum(em & (np.abs(ei - ej) > 1)))
        k = max(4, offrank_floor)
        while k < n_off:
            k *= 2
        if (config.chain_hubs, config.chain_coupling_capacity,
                config.chain_offrank_capacity) != (n_hub, coup_cap, k):
            config = dataclasses.replace(
                config, chain_hubs=n_hub, chain_coupling_capacity=coup_cap,
                chain_offrank_capacity=k)
    if config not in _OPT_CACHE:
        _OPT_CACHE[config] = jax.jit(_make_optimize(config))
    return _OPT_CACHE[config](graph, jnp.asarray(level, jnp.int32))
