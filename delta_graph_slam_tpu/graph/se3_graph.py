"""SE3 pose graph with plane and point landmarks (hdl_graph_slam parity).

Vertex kinds and their g2o counterparts:
- SE3 pose  (V,7) [t, q(wxyz)]   g2o::VertexSE3 (right-multiplicative updates)
- plane     (P,4) [n, w]          g2o::VertexPlane / Plane3D (coeffs with unit
                                  normal; distance() = -w; local updates are
                                  (azimuth, elevation, distance))
- point     (Q,3)                 g2o::VertexPointXYZ

Edge families mirror the types registered by the reference
(/root/reference/src/hdl_graph_slam/graph_slam.cpp:36-48 and include/g2o/):
EdgeSE3, EdgeSE3PriorXY/XYZ/Vec/Quat, EdgeSE3Plane, EdgeSE3PointXYZ,
EdgePlaneIdentity/Parallel/Perpendicular, EdgePlanePriorNormal/Distance.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..geom.se3 import quat_to_rot, rot_to_quat, se3_exp, se3_matrix
from .robust import kernel_id


# --------------------------------------------------------------- plane math

def plane_normalize(coeffs):
    n = jnp.linalg.norm(coeffs[..., :3], axis=-1, keepdims=True)
    return coeffs / jnp.maximum(n, 1e-12)


def plane_azimuth(n):
    """atan2(ny, nx), autodiff-safe at the pole (nx = ny = 0 -> 0).

    g2o's Plane3D uses plain atan2 with numeric Jacobians; analytic
    forward-mode needs the frozen branch to avoid NaN tangents for
    horizontal planes (the floor normal [0,0,1] is the common case)."""
    xy2 = n[..., 0] ** 2 + n[..., 1] ** 2
    safe = xy2 > 1e-20
    nx = jnp.where(safe, n[..., 0], 1.0)
    ny = jnp.where(safe, n[..., 1], 0.0)
    return jnp.where(safe, jnp.arctan2(ny, nx), 0.0)


def plane_elevation(n):
    xy2 = n[..., 0] ** 2 + n[..., 1] ** 2
    safe = xy2 > 1e-20
    denom = jnp.sqrt(jnp.where(safe, xy2, 1.0))
    pole = jnp.where(n[..., 2] >= 0, jnp.pi / 2, -jnp.pi / 2)
    return jnp.where(safe, jnp.arctan2(n[..., 2], denom), pole)


def plane_rotation(n):
    """g2o Plane3D::rotation(n) = Rz(azimuth) * Ry(-elevation)."""
    az = plane_azimuth(n)
    el = plane_elevation(n)
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se = jnp.cos(el), jnp.sin(el)
    # Rz(az) @ Ry(-el): maps the x-axis onto the unit normal n
    rows = [
        jnp.stack([ca * ce, -sa, -ca * se], -1),
        jnp.stack([sa * ce, ca, -sa * se], -1),
        jnp.stack([se, jnp.zeros_like(ca), ce], -1),
    ]
    return jnp.stack(rows, -2)


def plane_oplus(coeffs, delta):
    """g2o Plane3D::oplus — local (azimuth, elevation, distance) update."""
    az, el, dd = delta[..., 0], delta[..., 1], delta[..., 2]
    s, c = jnp.sin(el), jnp.cos(el)
    n_local = jnp.stack([c * jnp.cos(az), c * jnp.sin(az), s], -1)
    R = plane_rotation(coeffs[..., :3])
    n_new = (R @ n_local[..., None])[..., 0]
    d = -coeffs[..., 3] + dd  # distance() = -w
    out = jnp.concatenate([n_new, -d[..., None]], axis=-1)
    return plane_normalize(out)


def plane_ominus(a, b):
    """a.ominus(b): (azimuth, elevation) of b's normal in a's frame; d diff."""
    R = jnp.swapaxes(plane_rotation(a[..., :3]), -1, -2)
    n = (R @ b[..., :3, None])[..., 0]
    d = (-a[..., 3]) - (-b[..., 3])
    return jnp.stack([plane_azimuth(n), plane_elevation(n), d], -1)


def transform_plane(T, coeffs):
    """g2o operator*(Isometry3, Plane3D): n' = R n; w' = w - t . n'."""
    n2 = (T[..., :3, :3] @ coeffs[..., :3, None])[..., 0]
    w2 = coeffs[..., 3] - jnp.sum(T[..., :3, 3] * n2, axis=-1)
    return jnp.concatenate([n2, w2[..., None]], axis=-1)


# ------------------------------------------------------------ pose helpers

def pose7_to_matrix(p):
    return se3_matrix(quat_to_rot(p[..., 3:7]), p[..., :3])


def matrix_to_pose7(T):
    q = rot_to_quat(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], q], axis=-1)


def pose7_oplus(p, delta):
    """Right-multiplicative update: T' = T @ exp(delta) (g2o VertexSE3)."""
    T = pose7_to_matrix(p)
    return matrix_to_pose7(T @ se3_exp(delta))


def error_se3(pose_i, pose_j, meas):
    """g2o EdgeSE3: toVectorMQT(Z^-1 (Xi^-1 Xj)) = [dt, q_vec (w>=0)]."""
    Ti = pose7_to_matrix(pose_i)
    Tj = pose7_to_matrix(pose_j)
    Z = pose7_to_matrix(meas)
    # delta = Z^-1 * (Ti^-1 * Tj)
    Ri = Ti[:3, :3]
    Rrel = Ri.T @ Tj[:3, :3]
    trel = (Ri.T @ (Tj[:3, 3] - Ti[:3, 3])[..., None])[..., 0]
    Rz = Z[:3, :3]
    tz = Z[:3, 3]
    Rd = Rz.T @ Rrel
    td = (Rz.T @ (trel - tz)[..., None])[..., 0]
    q = rot_to_quat(Rd)  # canonicalized w >= 0
    return jnp.concatenate([td, q[1:4]])


def error_se3_prior_xy(pose, meas):
    return pose[:2] - meas


def error_se3_prior_xyz(pose, meas):
    return pose[:3] - meas


def error_se3_prior_vec(pose, meas):
    """meas = [direction(3), measured(3)] both unit: R^-1 dir - measured
    (include/g2o/edge_se3_priorvec.hpp:39-48)."""
    R = quat_to_rot(pose[3:7])
    est = R.T @ meas[:3]
    return est - meas[3:6]


def error_se3_prior_quat(pose, meas):
    """Sign-aligned quaternion vec difference
    (include/g2o/edge_se3_priorquat.hpp:39-48). meas = quat wxyz."""
    q = pose[3:7]
    q = jnp.where(jnp.sum(q * meas) < 0.0, -q, q)
    return q[1:4] - meas[1:4]


def error_se3_plane(pose, plane, meas):
    """(T^-1 * plane).ominus(meas) (include/g2o/edge_se3_plane.hpp:40-47)."""
    T = pose7_to_matrix(pose)
    R = T[:3, :3]
    Tinv = jnp.zeros((4, 4), pose.dtype)
    Tinv = Tinv.at[:3, :3].set(R.T)
    Tinv = Tinv.at[:3, 3].set(-(R.T @ T[:3, 3]))
    Tinv = Tinv.at[3, 3].set(1.0)
    local = transform_plane(Tinv, plane)
    return plane_ominus(local, meas)


def error_se3_point(pose, point, meas):
    """g2o EdgeSE3PointXYZ (no offset param): T^-1 p - meas."""
    R = quat_to_rot(pose[3:7])
    local = R.T @ (point - pose[:3])
    return local - meas


def error_plane_identity(p1, p2, meas):
    p2 = jnp.where(jnp.sum(p1 * p2) < 0.0, -p2, p2)
    return (p2 - p1) - meas


def error_plane_parallel(p1, p2, meas):
    n1, n2 = p1[:3], p2[:3]
    n2 = jnp.where(jnp.sum(n1 * n2) < 0.0, -n2, n2)
    return (n2 - n1) - meas


def error_plane_perpendicular(p1, p2, meas):
    n1 = p1[:3] / jnp.maximum(jnp.linalg.norm(p1[:3]), 1e-12)
    n2 = p2[:3] / jnp.maximum(jnp.linalg.norm(p2[:3]), 1e-12)
    return jnp.sum(n1 * n2)[None]


def error_plane_prior_normal(p, meas):
    n = p[:3]
    n = jnp.where(jnp.sum(n * meas) < 0.0, -n, n)
    return n - meas


def error_plane_prior_distance(p, meas):
    return (meas - (-p[3]))[None]


# ------------------------------------------------------------- edge tables

class SE3Edges(NamedTuple):
    i: jnp.ndarray; j: jnp.ndarray
    meas: jnp.ndarray    # (E,7) [t, q wxyz]
    info: jnp.ndarray    # (E,6,6)
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3PriorXYEdges(NamedTuple):
    i: jnp.ndarray; meas: jnp.ndarray; info: jnp.ndarray
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3PriorXYZEdges(NamedTuple):
    i: jnp.ndarray; meas: jnp.ndarray; info: jnp.ndarray
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3PriorVecEdges(NamedTuple):
    i: jnp.ndarray; meas: jnp.ndarray; info: jnp.ndarray
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3PriorQuatEdges(NamedTuple):
    i: jnp.ndarray; meas: jnp.ndarray; info: jnp.ndarray
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3PlaneEdges(NamedTuple):
    i: jnp.ndarray; p: jnp.ndarray
    meas: jnp.ndarray    # (E,4) plane coeffs
    info: jnp.ndarray    # (E,3,3)
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3PointEdges(NamedTuple):
    i: jnp.ndarray; q: jnp.ndarray
    meas: jnp.ndarray; info: jnp.ndarray
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class PlanePlaneEdges(NamedTuple):
    """identity (4-dim), parallel (3-dim) or perpendicular (1-dim) selected
    by ``kind``: 0=identity, 1=parallel, 2=perpendicular."""
    a: jnp.ndarray; b: jnp.ndarray
    kind: jnp.ndarray
    meas: jnp.ndarray    # (E,4) (parallel uses first 3; perpendicular unused)
    info: jnp.ndarray    # (E,4,4)
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class PlanePriorEdges(NamedTuple):
    """normal prior (3-dim, kind=0) or distance prior (1-dim, kind=1)."""
    p: jnp.ndarray
    kind: jnp.ndarray
    meas: jnp.ndarray    # (E,3) (distance prior uses meas[:,0])
    info: jnp.ndarray    # (E,3,3)
    level: jnp.ndarray; kernel: jnp.ndarray; delta: jnp.ndarray
    mask: jnp.ndarray


class SE3Graph(NamedTuple):
    poses: jnp.ndarray       # (V,7)
    fixed: jnp.ndarray
    vmask: jnp.ndarray
    planes: jnp.ndarray      # (P,4)
    plane_fixed: jnp.ndarray
    plane_mask: jnp.ndarray
    points: jnp.ndarray      # (Q,3)
    point_fixed: jnp.ndarray
    point_mask: jnp.ndarray
    edges: SE3Edges
    priors_xy: SE3PriorXYEdges
    priors_xyz: SE3PriorXYZEdges
    priors_vec: SE3PriorVecEdges
    priors_quat: SE3PriorQuatEdges
    se3_plane: SE3PlaneEdges
    se3_point: SE3PointEdges
    plane_plane: PlanePlaneEdges
    plane_priors: PlanePriorEdges


# ------------------------------------------------------------------ builder

class SE3GraphBuilder:
    """Host-side mutable SE3 graph mirroring the GraphSLAM facade helpers
    (/root/reference/include/hdl_graph_slam/graph_slam.hpp:52-123)."""

    def __init__(self, dtype=np.float64):
        self.dtype = dtype
        self.poses = []
        self.fixed = []
        self.planes = []
        self.plane_fixed = []
        self.points = []
        self.point_fixed = []
        self.edges = []
        self._next_edge_id = 0

    # vertices -------------------------------------------------------------
    def add_se3_node(self, pose, fixed=False) -> int:
        """pose: (4,4) homogeneous or (7,) [t,q wxyz]."""
        pose = np.asarray(pose, self.dtype)
        if pose.shape == (4, 4):
            pose = np.asarray(matrix_to_pose7(jnp.asarray(pose)), self.dtype)
        self.poses.append(pose)
        self.fixed.append(bool(fixed))
        return len(self.poses) - 1

    def add_plane_node(self, coeffs, fixed=False) -> int:
        c = np.asarray(coeffs, self.dtype)
        c = c / max(np.linalg.norm(c[:3]), 1e-12)
        self.planes.append(c)
        self.plane_fixed.append(bool(fixed))
        return len(self.planes) - 1

    def add_point_xyz_node(self, xyz, fixed=False) -> int:
        self.points.append(np.asarray(xyz, self.dtype))
        self.point_fixed.append(bool(fixed))
        return len(self.points) - 1

    def set_fixed(self, vid, fixed=True):
        self.fixed[vid] = bool(fixed)

    def set_pose(self, vid, pose):
        pose = np.asarray(pose, self.dtype)
        if pose.shape == (4, 4):
            pose = np.asarray(matrix_to_pose7(jnp.asarray(pose)), self.dtype)
        self.poses[vid] = pose

    @property
    def num_vertices(self):
        return len(self.poses) + len(self.planes) + len(self.points)

    @property
    def num_edges(self):
        return len(self.edges)

    # edges ----------------------------------------------------------------
    def _add(self, etype, **kw):
        eid = self._next_edge_id
        self._next_edge_id += 1
        kw.setdefault("level", 0)
        kw.setdefault("kernel", "NONE")
        kw.setdefault("delta", 1.0)
        kw["kernel"] = kernel_id(kw["kernel"])
        self.edges.append(dict(id=eid, type=etype, **kw))
        return eid

    def add_se3_edge(self, i, j, meas, info, **kw):
        """meas: relative pose i->j as (4,4) or (7,)."""
        meas = np.asarray(meas, self.dtype)
        if meas.shape == (4, 4):
            meas = np.asarray(matrix_to_pose7(jnp.asarray(meas)), self.dtype)
        return self._add("se3", i=i, j=j, meas=meas,
                         info=np.asarray(info, self.dtype), **kw)

    def add_se3_prior_xy_edge(self, i, xy, info, **kw):
        return self._add("xy", i=i, meas=np.asarray(xy, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_se3_prior_xyz_edge(self, i, xyz, info, **kw):
        return self._add("xyz", i=i, meas=np.asarray(xyz, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_se3_prior_vec_edge(self, i, direction, measurement, info, **kw):
        d = np.asarray(direction, self.dtype)
        m = np.asarray(measurement, self.dtype)
        d = d / max(np.linalg.norm(d), 1e-12)
        m = m / max(np.linalg.norm(m), 1e-12)
        return self._add("vec", i=i, meas=np.concatenate([d, m]),
                         info=np.asarray(info, self.dtype), **kw)

    def add_se3_prior_quat_edge(self, i, quat_wxyz, info, **kw):
        q = np.asarray(quat_wxyz, self.dtype)
        if q[0] < 0:
            q = -q
        return self._add("quat", i=i, meas=q,
                         info=np.asarray(info, self.dtype), **kw)

    def add_se3_plane_edge(self, i, p, plane_coeffs, info, **kw):
        c = np.asarray(plane_coeffs, self.dtype)
        c = c / max(np.linalg.norm(c[:3]), 1e-12)
        return self._add("se3plane", i=i, p=p, meas=c,
                         info=np.asarray(info, self.dtype), **kw)

    def add_se3_point_xyz_edge(self, i, q, xyz, info, **kw):
        return self._add("se3point", i=i, q=q, meas=np.asarray(xyz, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_plane_identity_edge(self, a, b, meas, info, **kw):
        return self._add("pp", a=a, b=b, kind=0,
                         meas=np.asarray(meas, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_plane_parallel_edge(self, a, b, meas, info, **kw):
        return self._add("pp", a=a, b=b, kind=1,
                         meas=np.asarray(meas, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_plane_perpendicular_edge(self, a, b, info, **kw):
        return self._add("pp", a=a, b=b, kind=2,
                         meas=np.zeros(3, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_plane_normal_prior_edge(self, p, normal, info, **kw):
        return self._add("pprior", p=p, kind=0,
                         meas=np.asarray(normal, self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def add_plane_distance_prior_edge(self, p, distance, info, **kw):
        return self._add("pprior", p=p, kind=1,
                         meas=np.asarray([distance, 0, 0], self.dtype),
                         info=np.asarray(info, self.dtype), **kw)

    def remove_edge(self, eid):
        self.edges = [e for e in self.edges if e["id"] != eid]

    # export ---------------------------------------------------------------
    @staticmethod
    def _cap(n, minimum=4):
        c = minimum
        while c < n:
            c *= 2
        return c

    def _pack(self, etype, fields, mdim, idim, extra=(), minimum=4):
        es = [e for e in self.edges if e["type"] == etype]
        ec = self._cap(len(es), minimum=minimum)
        dtype = self.dtype
        out = {f: np.zeros(ec, np.int32) for f in fields}
        out["meas"] = np.zeros((ec,) + mdim, dtype)
        out["info"] = np.zeros((ec,) + idim, dtype)
        out["level"] = np.zeros(ec, np.int32)
        out["kernel"] = np.zeros(ec, np.int32)
        out["delta"] = np.ones(ec, dtype)
        out["mask"] = np.zeros(ec, bool)
        for f in extra:
            out[f] = np.zeros(ec, np.int32)
        for k, e in enumerate(es):
            for f in fields + tuple(extra):
                out[f][k] = e[f]
            m = np.atleast_1d(np.asarray(e["meas"], dtype))
            out["meas"][k, : m.shape[0]] = m
            info = np.asarray(e["info"], dtype)
            if info.ndim == 0:
                # scalar -> isotropic information over the edge's natural dim
                info = info * np.eye(idim[0])
            d = info.shape[0]
            out["info"][k, :d, :d] = info
            out["level"][k] = e["level"]
            out["kernel"][k] = e["kernel"]
            out["delta"][k] = e["delta"]
            out["mask"][k] = True
        return out

    def to_arrays(self, dtype=None, v_capacity=None, e_capacity=None,
                  prior_capacity=None) -> SE3Graph:
        """Pack to padded device arrays. v_capacity / e_capacity /
        prior_capacity set capacity FLOORS (still pow2-doubled past them):
        a long-running backend preallocates at session scale so every
        3 s-cadence cycle reuses ONE compiled solver program instead of
        recompiling at each pow2 growth step (the r4 hdl pipeline's 0.56
        scans/s was mostly solver recompiles through the remote tunnel)."""
        dtype = dtype or self.dtype
        nv, npl, npt = len(self.poses), len(self.planes), len(self.points)
        vc = self._cap(nv, minimum=v_capacity or 4)
        pc, qc = self._cap(npl), self._cap(npt)
        ec = e_capacity or 4
        rc = prior_capacity or 4

        poses = np.zeros((vc, 7), dtype)
        poses[:, 3] = 1.0
        if nv:
            poses[:nv] = np.stack(self.poses)
        planes = np.zeros((pc, 4), dtype)
        planes[:, 2] = 1.0
        if npl:
            planes[:npl] = np.stack(self.planes)
        points = np.zeros((qc, 3), dtype)
        if npt:
            points[:npt] = np.stack(self.points)

        def msk(cap, n, flags):
            f = np.zeros(cap, bool)
            f[:n] = flags
            m = np.zeros(cap, bool)
            m[:n] = True
            return f, m

        fixed, vmask = msk(vc, nv, self.fixed)
        pfixed, pmask = msk(pc, npl, self.plane_fixed)
        qfixed, qmask = msk(qc, npt, self.point_fixed)

        J = jnp.asarray
        e = self._pack("se3", ("i", "j"), (7,), (6, 6), minimum=ec)
        edges = SE3Edges(J(e["i"]), J(e["j"]), J(e["meas"]), J(e["info"]),
                         J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        # identity quaternion for padded measurement slots
        fixq = np.array(edges.meas)
        fixq[~np.asarray(edges.mask), 3] = 1.0
        edges = edges._replace(meas=J(fixq))
        e = self._pack("xy", ("i",), (2,), (2, 2), minimum=rc)
        pxy = SE3PriorXYEdges(J(e["i"]), J(e["meas"]), J(e["info"]),
                              J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        e = self._pack("xyz", ("i",), (3,), (3, 3), minimum=rc)
        pxyz = SE3PriorXYZEdges(J(e["i"]), J(e["meas"]), J(e["info"]),
                                J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        e = self._pack("vec", ("i",), (6,), (3, 3), minimum=rc)
        pvec = SE3PriorVecEdges(J(e["i"]), J(e["meas"]), J(e["info"]),
                                J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        e = self._pack("quat", ("i",), (4,), (3, 3), minimum=rc)
        mq = e["meas"]
        mq[~e["mask"], 0] = 1.0
        pquat = SE3PriorQuatEdges(J(e["i"]), J(mq), J(e["info"]),
                                  J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        e = self._pack("se3plane", ("i", "p"), (4,), (3, 3), minimum=rc)
        mpl = e["meas"]
        mpl[~e["mask"], 2] = 1.0
        spl = SE3PlaneEdges(J(e["i"]), J(e["p"]), J(mpl), J(e["info"]),
                            J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        e = self._pack("se3point", ("i", "q"), (3,), (3, 3))
        spt = SE3PointEdges(J(e["i"]), J(e["q"]), J(e["meas"]), J(e["info"]),
                            J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        e = self._pack("pp", ("a", "b"), (4,), (4, 4), extra=("kind",))
        ppl = PlanePlaneEdges(J(e["a"]), J(e["b"]), J(e["kind"]), J(e["meas"]),
                              J(e["info"]), J(e["level"]), J(e["kernel"]),
                              J(e["delta"]), J(e["mask"]))
        e = self._pack("pprior", ("p",), (3,), (3, 3), extra=("kind",))
        ppr = PlanePriorEdges(J(e["p"]), J(e["kind"]), J(e["meas"]), J(e["info"]),
                              J(e["level"]), J(e["kernel"]), J(e["delta"]), J(e["mask"]))
        return SE3Graph(
            J(poses), J(fixed), J(vmask),
            J(planes), J(pfixed), J(pmask),
            J(points), J(qfixed), J(qmask),
            edges, pxy, pxyz, pvec, pquat, spl, spt, ppl, ppr,
        )

    def update_from(self, poses, planes=None, points=None):
        poses = np.asarray(poses)
        for v in range(len(self.poses)):
            self.poses[v] = poses[v].astype(self.dtype)
        if planes is not None:
            planes = np.asarray(planes)
            for p in range(len(self.planes)):
                self.planes[p] = planes[p].astype(self.dtype)
        if points is not None:
            points = np.asarray(points)
            for q in range(len(self.points)):
                self.points[q] = points[q].astype(self.dtype)
