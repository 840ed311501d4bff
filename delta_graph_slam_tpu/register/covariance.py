"""Batched 3x3 symmetric eigendecomposition and GICP covariance models.

fast_gicp computes per-point covariances from the k nearest neighbors and
regularizes them to "plane" form (eigenvalues -> [1e-3, 1, 1]); PCL NDT
floors small voxel-covariance eigenvalues relative to the largest. Both are
closed-form here (no LAPACK) so they vectorize across every point/voxel.
"""

import jax.numpy as jnp

from ..ops.knn import knn


def eigh3x3(A):
    """Eigen-decomposition of symmetric A (...,3,3).

    Returns (eigvals (...,3) ascending, eigvecs (...,3,3) column-major:
    eigvecs[...,:,i] is the unit eigenvector of eigvals[...,i]).
    Trigonometric closed form; robust for the (possibly degenerate)
    covariance matrices of real point neighborhoods.
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
    l_max = q + 2.0 * p * jnp.cos(phi)
    l_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l_mid = 3.0 * q - l_max - l_min
    vals = jnp.stack([l_min, l_mid, l_max], axis=-1)

    def eigvec_for(lam_other1, lam_other2):
        M = (A - lam_other1[..., None, None] * eye) @ (
            A - lam_other2[..., None, None] * eye
        )
        norms = jnp.linalg.norm(M, axis=-2)
        col = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(
            M, col[..., None, None].astype(jnp.int32), axis=-1
        )[..., 0]
        vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v, vn

    v_min, n_min = eigvec_for(l_max, l_mid)
    v_max, n_max = eigvec_for(l_min, l_mid)
    scale = jnp.maximum(jnp.abs(l_max), 1.0)
    ok_min = n_min[..., 0] > 1e-12 * scale
    ok_max = n_max[..., 0] > 1e-12 * scale
    ex = jnp.zeros_like(v_min).at[..., 0].set(1.0)
    ez = jnp.zeros_like(v_min).at[..., 2].set(1.0)
    v_min = jnp.where(ok_min[..., None], v_min / jnp.maximum(n_min, 1e-30), ez)
    v_max = jnp.where(ok_max[..., None], v_max / jnp.maximum(n_max, 1e-30), ex)
    # re-orthogonalize v_max against v_min (degenerate safety), then cross
    v_max = v_max - jnp.sum(v_max * v_min, -1, keepdims=True) * v_min
    v_max = v_max / jnp.maximum(jnp.linalg.norm(v_max, axis=-1, keepdims=True), 1e-30)
    v_mid = jnp.cross(v_max, v_min)
    vecs = jnp.stack([v_min, v_mid, v_max], axis=-1)
    return vals, vecs


def regularize_covariances(covs, mode="plane", floor_ratio=1e-2):
    """Rebuild covariances with modified eigenvalues.

    mode='plane'  : eigenvalues -> [1e-3, 1, 1]  (fast_gicp RegularizationMethod::PLANE)
    mode='floor'  : eigenvalues -> max(lam, floor_ratio * lam_max)  (PCL NDT style)
    mode='none'   : unchanged
    """
    if mode == "none":
        return covs
    vals, vecs = eigh3x3(covs)
    if mode == "plane":
        new_vals = jnp.broadcast_to(
            jnp.asarray([1e-3, 1.0, 1.0], covs.dtype), vals.shape
        )
    elif mode == "floor":
        lam_max = jnp.maximum(vals[..., 2:3], 1e-12)
        new_vals = jnp.maximum(vals, floor_ratio * lam_max)
    else:
        raise ValueError(mode)
    return jnp.einsum("...ij,...j,...kj->...ik", vecs, new_vals, vecs)


def knn_covariances(points, mask, k=20, *, mode="plane", chunk=1024):
    """Per-point neighborhood covariances (self included), regularized.

    fast_gicp semantics: covariance of the k nearest neighbors
    (correspondence_randomness), then 'plane' regularization.
    Returns (covs (N,3,3), valid (N,)).
    """
    d2, idx = knn(points, mask, points, mask, k=k, exclude_self=False, chunk=chunk)
    nb_valid = jnp.isfinite(d2)
    nb = points[idx]
    w = nb_valid.astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nb * w[..., None], axis=1) / cnt[:, None]
    centered = (nb - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nka,nkb->nab", centered, centered) / cnt[:, None, None]
    cov = regularize_covariances(cov, mode=mode)
    valid = mask & (jnp.sum(nb_valid, axis=1) >= 3)
    return cov, valid


def dense_covariances(points, mask, radius=1.0, *, mode="plane", chunk=4096):
    """Per-point covariances from the EXACT radius neighborhood, through
    the masked-moments matmul pass (ops/moments.py) — no gathers, so this
    is the TPU fast path for GICP covariance models. Neighborhood choice
    (radius vs fast_gicp's kNN) is DIVERGENCES.md #12; after 'plane'
    regularization only the local surface orientation survives, which
    agrees wherever the two neighborhoods see the same surface.
    Returns (covs (N,3,3), valid (N,))."""
    from ..ops.cloud import MaskedCloud
    from ..ops.moments import radius_moments

    cloud = MaskedCloud(points, mask)
    mom = radius_moments(cloud, cloud, radius,
                         chunk=min(chunk, points.shape[0]))
    cov = regularize_covariances(mom.cov, mode=mode)
    return cov, mask & (mom.count >= 3)
