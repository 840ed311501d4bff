"""Fixed-capacity masked point clouds and elementwise filters.

The reference mutates variable-length PCL clouds
(/root/reference/apps/prefiltering_nodelet.cpp). On TPU all shapes are
static: a cloud is ``(points (N,3), mask (N,))``; filters flip mask bits,
``compact`` re-packs valid points to the front so downstream gathers touch a
dense prefix.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Pose transforms are K=3 matmuls: full fp32 accumulate costs nothing and
# low-precision MXU defaults visibly corrupt geometry.
_HI = jax.lax.Precision.HIGHEST


class MaskedCloud(NamedTuple):
    points: jnp.ndarray  # (N, 3) float
    mask: jnp.ndarray    # (N,) bool

    @property
    def capacity(self):
        return self.points.shape[0]

    def count(self):
        return jnp.sum(self.mask)


def make_cloud(points, mask=None, capacity=None, dtype=jnp.float32):
    """Build a MaskedCloud from a (possibly ragged) numpy/jax array.

    Padding happens on the HOST: device-side eager pads would trigger one
    remote kernel compile per distinct scan length (every lidar frame has a
    different point count), which dominated the per-frame cost on the
    tunneled TPU. One fixed-shape upload instead.
    """
    import numpy as _np

    if isinstance(points, jnp.ndarray) and not isinstance(points, _np.ndarray):
        points = _np.asarray(points)
    pts = _np.asarray(points)
    n = pts.shape[0]
    if capacity is None:
        capacity = n
    if mask is None:
        mask_np = _np.ones((n,), bool)
    else:
        mask_np = _np.asarray(mask)
    if capacity != n:
        assert capacity > n, (capacity, n)
        pad = capacity - n
        pts = _np.pad(pts, ((0, pad), (0, 0)))
        mask_np = _np.pad(mask_np, (0, pad))
    np_dtype = _np.float32 if dtype == jnp.float32 else None
    return MaskedCloud(
        jnp.asarray(pts.astype(np_dtype) if np_dtype else pts, dtype),
        jnp.asarray(mask_np),
    )


def compact(cloud: MaskedCloud) -> MaskedCloud:
    """Stable re-pack of valid points to the front (invalid slots zeroed)."""
    order = jnp.argsort(~cloud.mask, stable=True)
    pts = cloud.points[order]
    mask = cloud.mask[order]
    return MaskedCloud(jnp.where(mask[:, None], pts, 0.0), mask)


def transform_cloud(cloud: MaskedCloud, T) -> MaskedCloud:
    """Apply a homogeneous (4,4) transform."""
    T = jnp.asarray(T, cloud.points.dtype)
    pts = jnp.matmul(cloud.points, T[:3, :3].T, precision=_HI) + T[:3, 3]
    return MaskedCloud(jnp.where(cloud.mask[:, None], pts, 0.0), cloud.mask)


def distance_filter(cloud: MaskedCloud, near: float, far: float) -> MaskedCloud:
    """Radial gate: keep near < |p| < far (prefiltering_nodelet.cpp:275-291)."""
    d = jnp.linalg.norm(cloud.points, axis=-1)
    keep = cloud.mask & (d > near) & (d < far)
    return MaskedCloud(cloud.points, keep)


def height_filter(cloud: MaskedCloud, z_min: float) -> MaskedCloud:
    """Keep points strictly above the lidar height
    (prefiltering_nodelet.cpp:192-209)."""
    keep = cloud.mask & (cloud.points[:, 2] > z_min)
    return MaskedCloud(cloud.points, keep)


def flatten_z(cloud: MaskedCloud) -> MaskedCloud:
    """Project to the z=0 plane (prefiltering_nodelet.cpp:166-184)."""
    return MaskedCloud(cloud.points.at[:, 2].set(0.0), cloud.mask)


def plane_clip(cloud: MaskedCloud, plane, negative: bool = False) -> MaskedCloud:
    """Keep points on one side of plane (a,b,c,d): sign of p.n + d.

    Mirrors pcl::PlaneClipper3D usage in floor detection
    (/root/reference/apps/floor_detection_nodelet.cpp:189-204).
    """
    plane = jnp.asarray(plane, cloud.points.dtype)
    dist = cloud.points @ plane[:3] + plane[3]
    keep = (dist < 0.0) if negative else (dist > 0.0)
    return MaskedCloud(cloud.points, cloud.mask & keep)


def deskew(cloud: MaskedCloud, angular_velocity, scan_period: float = 0.1) -> MaskedCloud:
    """IMU-based rotational deskew (prefiltering_nodelet.cpp:293-354).

    Point i (acquired at t_i = scan_period * i / N) is rotated by the inverse
    of the small-angle quaternion delta_q = [1, t_i/2 * (-w)] (the reference
    negates the angular velocity then applies delta_q.inverse()).
    """
    w = -jnp.asarray(angular_velocity, cloud.points.dtype)
    n = cloud.capacity
    t = scan_period * jnp.arange(n, dtype=cloud.points.dtype) / n
    half = 0.5 * t[:, None] * w  # (N,3) quaternion vector parts; scalar = 1
    # inverse of q=[1, v] is conj/|q|^2; rotation by the *normalized* inverse.
    norm2 = 1.0 + jnp.sum(half * half, axis=-1, keepdims=True)
    qw = 1.0 / jnp.sqrt(norm2)
    qv = -half / jnp.sqrt(norm2)
    # Rodrigues via quaternion: p' = p + 2 qw (qv x p) + 2 qv x (qv x p)
    c1 = jnp.cross(qv, cloud.points)
    c2 = jnp.cross(qv, c1)
    pts = cloud.points + 2.0 * qw * c1 + 2.0 * c2
    return MaskedCloud(jnp.where(cloud.mask[:, None], pts, 0.0), cloud.mask)
