"""SE(3) transforms, quaternions, and the SE3<->SE2 bridge.

The reference flattens every 3-D odometry pose to SE2 through a
normalized-Euler yaw extraction (transform3Dto2D / normalize_euler_angs,
/root/reference/src/hdl_graph_slam/ros_utils.cpp:95-144). This module
reproduces those semantics with batched, jit-friendly array math.

Quaternion layout is ``[w, x, y, z]`` throughout.
"""

import jax.numpy as jnp


def quat_to_rot(q):
    """Quaternion(s) (...,4) [w,x,y,z] -> rotation matrix (...,3,3)."""
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def rot_to_quat(R):
    """Rotation matrix (...,3,3) -> quaternion (...,4) [w,x,y,z], w >= 0.

    Branch-free Shepperd-style construction (safe under jit/vmap).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12), (m02 - m20), (m10 - m01)], -1)
    q0 = q0.at[..., 1:].divide(jnp.maximum(4.0 * qw0, 1e-12)[..., None])

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    q1 = jnp.stack([(m21 - m12), qx1, (m01 + m10), (m02 + m20)], -1)
    d1 = jnp.maximum(4.0 * qx1, 1e-12)
    q1 = jnp.concatenate(
        [q1[..., :1] / d1[..., None], q1[..., 1:2], q1[..., 2:] / d1[..., None]], -1
    )

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    q2 = jnp.stack([(m02 - m20), (m01 + m10), qy2, (m12 + m21)], -1)
    d2 = jnp.maximum(4.0 * qy2, 1e-12)
    q2 = jnp.concatenate(
        [q2[..., :2] / d2[..., None], q2[..., 2:3], q2[..., 3:] / d2[..., None]], -1
    )

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    q3 = jnp.stack([(m10 - m01), (m02 + m20), (m12 + m21), qz3], -1)
    d3 = jnp.maximum(4.0 * qz3, 1e-12)
    q3 = jnp.concatenate([q3[..., :3] / d3[..., None], q3[..., 3:]], -1)

    # Pivot selection: trace vs diagonal entries.
    cand = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(cand, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4cands,4)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def se3_matrix(R=None, t=None, quat=None):
    """Assemble homogeneous (...,4,4) from rotation (matrix or quat) + translation."""
    if quat is not None:
        R = quat_to_rot(quat)
    R = jnp.asarray(R)
    if t is None:
        t = jnp.zeros(R.shape[:-2] + (3,), R.dtype)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T):
    """Inverse of homogeneous (...,4,4)."""
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    return se3_matrix(Rt, ti)


def se3_apply(T, pts):
    """Apply (...,4,4) to points (...,N,3) -> (...,N,3)."""
    T = jnp.asarray(T)
    pts = jnp.asarray(pts)
    R = T[..., :3, :3]
    t = T[..., None, :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t


def _skew(w):
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], z, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], z], -1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues: rotation vector (...,3) -> rotation matrix (...,3,3).

    NB: guards are on th^2 and the norm is only taken of a guarded value so
    forward-mode autodiff at w = 0 stays finite (the 6-dof pose-graph
    Jacobians differentiate through here at exactly zero).
    """
    w = jnp.asarray(w)
    th2 = jnp.sum(w * w, axis=-1)
    small = th2 < 1e-16
    th_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(th2), th2))
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th_safe) / th_safe)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th_safe)) / th_safe**2)
    K = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R):
    """Rotation matrix (...,3,3) -> rotation vector (...,3)."""
    R = jnp.asarray(R)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    th = jnp.arccos(cos)
    small = th < 1e-6
    th_safe = jnp.where(small, jnp.ones_like(th), th)
    factor = jnp.where(small, 0.5 + th * th / 12.0, th_safe / (2.0 * jnp.sin(th_safe)))
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # NB: near th = pi the vee form degrades; adequate for incremental updates.
    return factor[..., None] * vee


def se3_exp(xi):
    """xi (...,6) = [v, w] -> homogeneous (...,4,4). Autodiff-safe at 0."""
    xi = jnp.asarray(xi)
    v, w = xi[..., :3], xi[..., 3:]
    th2 = jnp.sum(w * w, axis=-1)
    small = th2 < 1e-16
    th_safe = jnp.sqrt(jnp.where(small, jnp.ones_like(th2), th2))
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th_safe)) / th_safe**2)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (th_safe - jnp.sin(th_safe)) / th_safe**3)
    K = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + B[..., None, None] * K + C[..., None, None] * (K @ K)
    R = so3_exp(w)
    t = (V @ v[..., None])[..., 0]
    return se3_matrix(R, t)


def se3_log(T):
    """Homogeneous (...,4,4) -> xi (...,6) = [v, w]."""
    T = jnp.asarray(T)
    w = so3_log(T[..., :3, :3])
    th = jnp.linalg.norm(w, axis=-1)
    small = th < 1e-6
    th_safe = jnp.where(small, jnp.ones_like(th), th)
    half = th_safe / 2.0
    cot_term = jnp.where(
        small, 1.0 - th * th / 12.0, half * jnp.cos(half) / jnp.sin(half)
    )
    K = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    th2_safe = jnp.where(small, jnp.ones_like(th), th * th)
    Vinv = (
        eye
        - 0.5 * K
        + ((1.0 - cot_term) / th2_safe)[..., None, None] * (K @ K)
    )
    v = (Vinv @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def euler_xyz_from_rot(R):
    """Extract Tait-Bryan angles (a,b,c) with R = Rx(a) @ Ry(b) @ Rz(c).

    Returns the representative with the first angle in [0, pi], matching
    Eigen's ``eulerAngles(0,1,2)`` range convention that the reference's
    transform3Dto2D relies on (/root/reference/src/hdl_graph_slam/
    ros_utils.cpp:125-131). Shapes: (...,3,3) -> (...,3).
    """
    R = jnp.asarray(R)
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r12, r22 = R[..., 1, 2], R[..., 2, 2]
    # Standard extraction (cos(b) > 0 branch):
    #   a = atan2(-R12, R22); b = atan2(R02, hypot(R00, R01)); c = atan2(-R01, R00)
    a = jnp.arctan2(-r12, r22)
    cb = jnp.hypot(r00, r01)
    # Eigen constrains the first angle to [0, pi]: when a < 0 switch to the
    # second representative (a+pi, pi-b, c+pi), all wrapped via atan2 signs.
    flip = a < 0
    a = jnp.where(flip, jnp.arctan2(r12, -r22), a)
    b = jnp.where(flip, jnp.arctan2(r02, -cb), jnp.arctan2(r02, cb))
    c = jnp.where(flip, jnp.arctan2(r01, -r00), jnp.arctan2(-r01, r00))
    return jnp.stack([a, b, c], axis=-1)


def normalize_euler_angs(euler):
    """Min-norm Euler representative trick (ros_utils.cpp:95-113).

    Subtract pi*sign from every component and keep whichever vector has the
    smaller norm. euler (...,3) -> (...,3).
    """
    euler = jnp.asarray(euler)
    shifted = euler - jnp.pi * jnp.where(euler >= 0, 1.0, -1.0)
    keep = jnp.linalg.norm(shifted, axis=-1, keepdims=True) < jnp.linalg.norm(
        euler, axis=-1, keepdims=True
    )
    return jnp.where(keep, shifted, euler)


def yaw_from_rot(R):
    """Yaw via the reference's normalized-Euler trick (ros_utils.cpp:125-131)."""
    return normalize_euler_angs(euler_xyz_from_rot(R))[..., 2]


def transform_3d_to_2d(T):
    """SE3 (...,4,4) -> SE2 params (...,3) [x,y,theta] (ros_utils.cpp:123-144)."""
    T = jnp.asarray(T)
    yaw = yaw_from_rot(T[..., :3, :3])
    return jnp.stack([T[..., 0, 3], T[..., 1, 3], yaw], axis=-1)


def transform_2d_to_3d(p):
    """SE2 params (...,3) -> SE3 (...,4,4) with z=0, roll=pitch=0
    (ros_utils.cpp:105-121)."""
    p = jnp.asarray(p)
    x, y, th = p[..., 0], p[..., 1], p[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows = [
        jnp.stack([c, -s, z, x], -1),
        jnp.stack([s, c, z, y], -1),
        jnp.stack([z, z, o, z], -1),
        jnp.stack([z, z, z, o], -1),
    ]
    return jnp.stack(rows, axis=-2)
