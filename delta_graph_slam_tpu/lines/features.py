"""Line segments, corner ("edge") features, and candidate transforms.

All 2-D, fixed-capacity, masked. Mirrors the reference structures
LineFeature / EdgeFeature (include/hdl_graph_slam/
line_based_scanmatcher.hpp:23-47) and the geometry of
edge_extraction/get_edges/align_edges/align_lines
(src/hdl_graph_slam/line_based_scanmatcher.cpp:459-767).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ransac import LineSegments

_BIG = 1e9


class EdgeFeatures(NamedTuple):
    """Corner features: intersection point + one endpoint per arm."""

    corner: jnp.ndarray   # (E,2)
    a: jnp.ndarray        # (E,2) arm endpoint on line 1
    b: jnp.ndarray        # (E,2) arm endpoint on line 2
    mask: jnp.ndarray     # (E,)


def make_lines(a, b, capacity=None, dtype=jnp.float32) -> LineSegments:
    """Build LineSegments from (L,2) endpoint arrays (host convenience)."""
    a = np.atleast_2d(np.asarray(a, np.float64))[:, :2]
    b = np.atleast_2d(np.asarray(b, np.float64))[:, :2]
    n = len(a)
    cap = capacity or max(n, 1)
    A = np.zeros((cap, 2))
    B = np.zeros((cap, 2))
    A[:n] = a
    B[:n] = b
    mask = np.zeros(cap, bool)
    mask[:n] = True
    z = jnp.zeros(cap, dtype)
    return LineSegments(
        a=jnp.asarray(A, dtype), b=jnp.asarray(B, dtype),
        mean_error=z, std_sigma=z, max_error=z, min_error=z,
        mask=jnp.asarray(mask),
    )


@jax.jit
def transform_lines(lines: LineSegments, T) -> LineSegments:
    """Apply a rigid transform; T may be (3,3) SE2 or (4,4) SE3 (xy part)."""
    T = jnp.asarray(T, lines.a.dtype)
    if T.shape[-1] == 4:
        R = T[:2, :2]
        t = T[:2, 3]
    else:
        R = T[:2, :2]
        t = T[:2, 2]
    return lines._replace(a=lines.a @ R.T + t, b=lines.b @ R.T + t)


def _norm(v):
    return jnp.linalg.norm(v, axis=-1)


def _unit(v):
    return v / jnp.maximum(_norm(v)[..., None], 1e-12)


def lines_intersection(a1, b1, a2, b2):
    """Infinite-line intersection (batched); parallel -> (BIG, BIG).
    Mirrors lines_intersection (line_based_scanmatcher.cpp:473-500)."""
    A1 = b1[..., 1] - a1[..., 1]
    B1 = a1[..., 0] - b1[..., 0]
    C1 = A1 * a1[..., 0] + B1 * a1[..., 1]
    A2 = b2[..., 1] - a2[..., 1]
    B2 = a2[..., 0] - b2[..., 0]
    C2 = A2 * a2[..., 0] + B2 * a2[..., 1]
    det = A1 * B2 - A2 * B1
    ok = jnp.abs(det) > 1e-12
    det_safe = jnp.where(ok, det, 1.0)
    x = (B2 * C1 - B1 * C2) / det_safe
    y = (A1 * C2 - A2 * C1) / det_safe
    x = jnp.where(ok, x, _BIG)
    y = jnp.where(ok, y, _BIG)
    return jnp.stack([x, y], -1), ok


@partial(jax.jit, static_argnames=(
    "only_angular_edges", "max_dist_angular_edge", "capacity"))
def edge_extraction(
    lines: LineSegments,
    only_angular_edges: bool = False,
    max_dist_angular_edge: float = 7.0,
    capacity: int = 256,
) -> EdgeFeatures:
    """All corner features from near-perpendicular line pairs.

    Vectorizes get_edges' four-case analysis (line_based_scanmatcher.cpp:
    502-682): for every unordered pair (i<j) up to 4 candidate edges are
    emitted with masks; results are compacted into ``capacity`` slots.

    Jitted as one program: called eagerly this body is ~10^2 tiny op
    dispatches per invocation, each a distinct first-call XLA compile —
    minutes of host stall per session on the per-keyframe backend path
    (delta_backend cloud_callback -> align_global/align_local).
    """
    L = lines.a.shape[0]
    ii, jj = jnp.triu_indices(L, k=1)
    a1, b1 = lines.a[ii], lines.b[ii]
    a2, b2 = lines.a[jj], lines.b[jj]
    pair_ok = lines.mask[ii] & lines.mask[jj]

    d1 = _unit(a1 - b1)
    d2 = _unit(a2 - b2)
    cosine = jnp.sum(d1 * d2, -1)
    pair_ok = pair_ok & (jnp.abs(cosine) <= 0.5)

    corner, int_ok = lines_intersection(a1, b1, a2, b2)
    pair_ok = pair_ok & int_ok

    min_side = 1.0
    s1A, s1B = a1 - corner, b1 - corner
    s2A, s2B = a2 - corner, b2 - corner
    n1A, n1B = _norm(s1A), _norm(s1B)
    n2A, n2B = _norm(s2A), _norm(s2B)
    same1 = (n1A < 0.01) | (n1B < 0.01) | (_norm(_unit(s1A) - _unit(s1B)) < 1.0)
    same2 = (n2A < 0.01) | (n2B < 0.01) | (_norm(_unit(s2A) - _unit(s2B)) < 1.0)

    long1 = jnp.where((n1A > n1B)[..., None], a1, b1)     # longest arm line1
    long2 = jnp.where((n2A > n2B)[..., None], a2, b2)
    max1, min1 = jnp.maximum(n1A, n1B), jnp.minimum(n1A, n1B)
    max2, min2 = jnp.maximum(n2A, n2B), jnp.minimum(n2A, n2B)

    # CASE 1: both lines end at the corner -> 1 edge (longest arms)
    c1_ok = same1 & same2 & (max1 >= min_side) & (max2 >= min_side)
    if only_angular_edges:
        c1_ok = c1_ok & (min1 <= max_dist_angular_edge) & (min2 <= max_dist_angular_edge)
    e1 = (corner, long1, long2, c1_ok)

    # CASE 2: line1 ends at corner, line2 crosses -> up to 2 edges
    c2_base = same1 & ~same2 & (max1 >= min_side)
    if only_angular_edges:
        c2_base = c2_base & (min1 <= max_dist_angular_edge)
    e2a = (corner, long1, a2, c2_base & (n2A > min_side))
    e2b = (corner, long1, b2, c2_base & (n2B > min_side))

    # CASE 3: symmetric (line2 ends at corner, line1 crosses)
    c3_base = ~same1 & same2 & (max2 >= min_side)
    if only_angular_edges:
        c3_base = c3_base & (min2 <= max_dist_angular_edge)
    e3a = (corner, long2, a1, c3_base & (n1A > min_side))
    e3b = (corner, long2, b1, c3_base & (n1B > min_side))

    # CASE 4: both cross -> up to 4 edges (one per arm pair)
    c4 = ~same1 & ~same2
    e4aa = (corner, a1, a2, c4 & (n1A > min_side) & (n2A > min_side))
    e4ab = (corner, a1, b2, c4 & (n1A > min_side) & (n2B > min_side))
    e4ba = (corner, b1, a2, c4 & (n1B > min_side) & (n2A > min_side))
    e4bb = (corner, b1, b2, c4 & (n1B > min_side) & (n2B > min_side))

    cands = [e1, e2a, e2b, e3a, e3b, e4aa, e4ab, e4ba, e4bb]
    corners = jnp.concatenate([c[0] for c in cands])
    arms_a = jnp.concatenate([c[1] for c in cands])
    arms_b = jnp.concatenate([c[2] for c in cands])
    masks = jnp.concatenate([c[3] & pair_ok for c in cands])

    # compact to capacity
    order = jnp.argsort(~masks, stable=True)[:capacity]
    return EdgeFeatures(
        corner=jnp.where(masks[order][:, None], corners[order], 0.0),
        a=jnp.where(masks[order][:, None], arms_a[order], 0.0),
        b=jnp.where(masks[order][:, None], arms_b[order], 0.0),
        mask=masks[order],
    )


def _angle_between(A, B):
    """Signed angle from A to B (batched 2-D), (cpp:684-691)."""
    dot = A[..., 0] * B[..., 0] + A[..., 1] * B[..., 1]
    det = A[..., 0] * B[..., 1] - A[..., 1] * B[..., 0]
    return jnp.arctan2(det, dot)


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )


def align_edges(e1_corner, e1a, e1b, e2_corner, e2a, e2b):
    """Rigid transform aligning edge1 to edge2 (cpp:693-740), batched.

    Two candidate rotations map either arm of edge1 onto edge2's longest
    arm; the one leaving the smaller residual to the other arm wins.
    Returns (R (...,2,2), t (...,2)).
    """
    s1A = e1a - e1_corner
    s1B = e1b - e1_corner
    s2A = e2a - e2_corner
    s2B = e2b - e2_corner
    swap = _norm(s2A) < _norm(s2B)
    s2A, s2B = (
        jnp.where(swap[..., None], s2B, s2A),
        jnp.where(swap[..., None], s2A, s2B),
    )
    ang1 = _angle_between(s1A, s2A)
    ang2 = _angle_between(s1B, s2A)
    R1 = _rot2(ang1)
    R2 = _rot2(ang2)
    r1B = (R1 @ s1B[..., None])[..., 0]
    r2A = (R2 @ s1A[..., None])[..., 0]
    ang3 = _angle_between(r1B, s2B)
    ang4 = _angle_between(r2A, s2B)
    use1 = jnp.abs(ang3) < jnp.abs(ang4)
    R = jnp.where(use1[..., None, None], R1, R2)
    t = e2_corner - (R @ e1_corner[..., None])[..., 0]
    return R, t


def align_lines_pair(l1a, l1b, l2a, l2b):
    """Rotate line1 parallel to line2 and project its A endpoint onto
    line2's infinite line (cpp:742-767), batched. Returns (R, t)."""
    ang = _angle_between(l1a - l1b, l2a - l2b)
    ang = jnp.where(ang > jnp.pi / 2, ang - jnp.pi, ang)
    ang = jnp.where(ang < -jnp.pi / 2, ang + jnp.pi, ang)
    d = _unit(l2a - l2b)
    proj = l2a + d * jnp.sum((l1a - l2a) * d, -1, keepdims=True)
    R = _rot2(ang)
    t = proj - (R @ l1a[..., None])[..., 0]
    return R, t
