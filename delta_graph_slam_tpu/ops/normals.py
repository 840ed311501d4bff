"""kNN surface normals with an analytic 3x3 symmetric eigensolver.

Replaces pcl::NormalEstimation as used by the prefiltering 2-D branch
(k=10 normals, keep |n_z| < 0.2; /root/reference/apps/
prefiltering_nodelet.cpp:217-247) and floor detection (k=10, keep
|n_z| > thresh; /root/reference/apps/floor_detection_nodelet.cpp:211-238).

The eigensolver is closed-form (no iteration, no LAPACK) so it vectorizes
onto the VPU for every point simultaneously.
"""

import jax.numpy as jnp

from .cloud import MaskedCloud
from .knn import knn


def smallest_eigvec_3x3(A):
    """Unit eigenvector of the smallest eigenvalue of symmetric A (...,3,3).

    Trigonometric eigenvalues + product-of-shifted-matrices eigenvector.
    Falls back to +z for isotropic neighborhoods.
    """
    A = jnp.asarray(A)
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=A.dtype)
    Aq = A - q[..., None, None] * eye
    p2 = jnp.sum(Aq * Aq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = Aq / p[..., None, None]
    r = jnp.clip(jnp.linalg.det(B) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min

    # columns of (A - lam_max I)(A - lam_mid I) span the lam_min eigenspace
    M = (A - lam_max[..., None, None] * eye) @ (A - lam_mid[..., None, None] * eye)
    norms = jnp.linalg.norm(M, axis=-2)  # column norms (...,3)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None].astype(jnp.int32), axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    ok = vn[..., 0] > 1e-12 * jnp.maximum(jnp.abs(lam_max), 1.0)
    v = jnp.where(ok[..., None], v / jnp.maximum(vn, 1e-30), fallback)
    return v


def estimate_normals(cloud: MaskedCloud, k: int = 10, viewpoint=(0.0, 0.0, 0.0),
                     *, chunk=1024, method="brute", voxel_resolution=0.75,
                     voxel_window=16, radius=0.75):
    """Per-point unit normals from the k nearest neighbors (self included),
    oriented toward the viewpoint. Returns (normals (N,3), valid (N,)).

    method='dense' (the TPU fast path) uses the exact radius-neighborhood
    covariance from the masked-moments matmul pass instead of a kNN
    neighborhood — pcl::NormalEstimation setRadiusSearch(radius) semantics
    instead of the reference's setKSearch(k) (see DIVERGENCES.md); ``radius``
    may be per-point for range-adaptive density. method='voxel' bounds the
    kNN candidates to a spatial hash (27 cells x window points); 'brute' is
    the exact tiled kNN search.
    """
    pts, mask = cloud.points, cloud.mask
    if method == "dense":
        from .moments import radius_moments

        mom = radius_moments(cloud, cloud, radius,
                             chunk=min(4096, cloud.capacity))
        n = smallest_eigvec_3x3(mom.cov)
        vp = jnp.asarray(viewpoint, pts.dtype)
        flip = jnp.sum((vp - pts) * n, axis=-1) < 0.0
        n = jnp.where(flip[:, None], -n, n)
        valid = mask & (mom.count >= 3)
        return n, valid
    if method == "voxel":
        import numpy as _np

        from .voxel import build_voxel_hash
        from .voxel_knn import voxel_knn

        vh = build_voxel_hash(cloud, voxel_resolution, pts.shape[0],
                              dense_index=True, with_stats=False)
        offs = _np.asarray(
            [[i, j, l] for i in (-1, 0, 1) for j in (-1, 0, 1)
             for l in (-1, 0, 1)], _np.int32,
        )
        # query with the ORIGINAL point order so the mask lines up
        d2, idx, ok = voxel_knn(vh, pts, mask, k, offs, window=voxel_window)
        nb_valid = ok & jnp.isfinite(d2)
        nb = vh.sorted_points[idx]
    else:
        d2, idx = knn(pts, mask, pts, mask, k=k, exclude_self=False, chunk=chunk)
        nb_valid = jnp.isfinite(d2)  # (N,k)
        nb = pts[idx]  # (N,k,3)
    w = nb_valid.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nb * w[..., None], axis=1) / cnt[:, None]
    centered = (nb - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nka,nkb->nab", centered, centered) / cnt[:, None, None]
    n = smallest_eigvec_3x3(cov)
    vp = jnp.asarray(viewpoint, pts.dtype)
    flip = jnp.sum((vp - pts) * n, axis=-1) < 0.0
    n = jnp.where(flip[:, None], -n, n)
    valid = mask & (jnp.sum(nb_valid, axis=1) >= 3)
    return n, valid


def normal_filter(
    cloud: MaskedCloud,
    thresh: float = 0.2,
    k: int = 10,
    viewpoint=(0.0, 0.0, 0.0),
    keep_vertical_surfaces: bool = True,
    *,
    chunk=1024,
    method="brute",
    radius=0.75,
) -> MaskedCloud:
    """Keep points by normal verticality.

    keep_vertical_surfaces=True : |n_z| <  thresh (walls; prefiltering:217-247)
    keep_vertical_surfaces=False: |n_z| >  thresh (floors; floor_detection:211-238)
    """
    n, valid = estimate_normals(cloud, k=k, viewpoint=viewpoint, chunk=chunk,
                                method=method, radius=radius)
    nz = jnp.abs(n[:, 2])
    keep = (nz < thresh) if keep_vertical_surfaces else (nz > thresh)
    return MaskedCloud(cloud.points, cloud.mask & valid & keep)
