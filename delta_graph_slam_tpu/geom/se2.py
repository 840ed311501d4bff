"""SE(2) rigid transforms as batched arrays.

Two interchangeable representations:

- params  ``(..., 3)``   -> ``[x, y, theta]`` (the pose-graph state layout)
- matrix  ``(..., 3, 3)`` homogeneous transform

All functions broadcast over leading batch dimensions and follow the input
dtype. The pose-graph backend of the reference stores SE2 vertices
(g2o::VertexSE2, /root/reference/apps/delta_graph_slam_nodelet.cpp:45-48);
this module is the array-native equivalent of that state plus the
Eigen::Isometry2 algebra used throughout the reference.
"""

import jax.numpy as jnp


def normalize_angle(theta):
    """Wrap angle(s) to (-pi, pi].

    Matches g2o::normalize_theta semantics used by the SE2 yaw-prior edge
    (/root/reference/include/g2o/edge_se2_priorquat.hpp:36-48).
    """
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def rot2(theta):
    """2x2 rotation matrix/matrices from angle(s). theta: (...,) -> (...,2,2)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def se2_matrix(params):
    """params (...,3) [x,y,theta] -> homogeneous (...,3,3)."""
    params = jnp.asarray(params)
    x, y, th = params[..., 0], params[..., 1], params[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows = [
        jnp.stack([c, -s, x], axis=-1),
        jnp.stack([s, c, y], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def se2_params(matrix):
    """Homogeneous (...,3,3) -> params (...,3) [x,y,theta]."""
    matrix = jnp.asarray(matrix)
    th = jnp.arctan2(matrix[..., 1, 0], matrix[..., 0, 0])
    return jnp.stack([matrix[..., 0, 2], matrix[..., 1, 2], th], axis=-1)


def se2_compose(a, b):
    """Compose two SE2 params: a ∘ b (apply b first, then a). (...,3)x(...,3)->(...,3)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    th = normalize_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def se2_inverse(p):
    """Inverse of SE2 params (...,3)->(...,3)."""
    p = jnp.asarray(p)
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = -(c * p[..., 0] + s * p[..., 1])
    y = -(-s * p[..., 0] + c * p[..., 1])
    return jnp.stack([x, y, -p[..., 2]], axis=-1)


def se2_apply(p, pts):
    """Apply SE2 params p (...,3) to points pts (...,N,2) -> (...,N,2)."""
    p = jnp.asarray(p)
    pts = jnp.asarray(pts)
    R = rot2(p[..., 2])
    t = p[..., None, :2]
    return pts @ jnp.swapaxes(R, -1, -2) + t


def se2_exp(xi):
    """SE(2) exponential map. xi (...,3) = [vx, vy, omega] -> params (...,3).

    Uses the exact V(omega) integration with a Taylor guard at omega ~ 0.
    """
    xi = jnp.asarray(xi)
    vx, vy, w = xi[..., 0], xi[..., 1], xi[..., 2]
    small = jnp.abs(w) < 1e-6
    w_safe = jnp.where(small, jnp.ones_like(w), w)
    sw, cw = jnp.sin(w_safe), jnp.cos(w_safe)
    a = jnp.where(small, 1.0 - w * w / 6.0, sw / w_safe)      # sin(w)/w
    b = jnp.where(small, w / 2.0 - w**3 / 24.0, (1.0 - cw) / w_safe)  # (1-cos w)/w
    x = a * vx - b * vy
    y = b * vx + a * vy
    return jnp.stack([x, y, normalize_angle(w)], axis=-1)


def se2_log(p):
    """SE(2) logarithm map. params (...,3) -> xi (...,3)."""
    p = jnp.asarray(p)
    x, y, th = p[..., 0], p[..., 1], normalize_angle(p[..., 2])
    small = jnp.abs(th) < 1e-6
    th_safe = jnp.where(small, jnp.ones_like(th), th)
    half = th_safe / 2.0
    # inverse of V(theta): V^-1 = (half*cot(half)) I - half * skew
    cot_term = jnp.where(
        small, 1.0 - th * th / 12.0, half * jnp.cos(half) / jnp.sin(half)
    )
    vx = cot_term * x + (th / 2.0) * y
    vy = -(th / 2.0) * x + cot_term * y
    return jnp.stack([vx, vy, th], axis=-1)
