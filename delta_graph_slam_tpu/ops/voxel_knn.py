"""Voxel-hash accelerated neighbor search.

The brute-force tiled kNN (ops/knn.py) is exact but O(N*M) per query set —
the dominant cost of GICP at KITTI scale. This module bounds the candidate
set with the VoxelHash: each query gathers a fixed window of points from
the 27 (or 7) neighboring cells of the sorted-by-cell point array, then
reduces top-k over ~27*window candidates. Exact for neighbors within one
cell radius; beyond that the brute-force path remains available
(RegistrationConfig.nn_method='brute').
"""

import jax
import jax.numpy as jnp

from .voxel import VoxelHash, voxel_lookup

_INF = jnp.inf


def voxel_nn(vh: VoxelHash, query, qmask, offsets, window=8, max_d2=_INF):
    """1-NN among windowed candidates. Returns (d2 (N,), idx (N,) into
    vh.sorted_points, valid (N,))."""
    d2, idx, valid = voxel_knn(vh, query, qmask, 1, offsets, window, max_d2)
    return d2[:, 0], idx[:, 0], valid[:, 0]


def voxel_knn(vh: VoxelHash, query, qmask, k, offsets, window=8,
              max_d2=_INF):
    """k-NN among windowed candidates.

    Returns (d2 (N,k) ascending, idx (N,k) indices into vh.sorted_points,
    valid (N,k)). Missing candidates -> d2 = inf.
    """
    slots, hit = voxel_lookup(vh, query, qmask, offsets=offsets)  # (N,M)
    n, m = slots.shape
    starts = vh.starts[slots]                   # (N,M)
    counts = vh.counts[slots].astype(jnp.int32)
    w = jnp.arange(window, dtype=jnp.int32)
    cand = starts[:, :, None] + w[None, None, :]          # (N,M,W)
    cvalid = hit[:, :, None] & (w[None, None, :] < counts[:, :, None])
    npts = vh.sorted_points.shape[0]
    cand = jnp.clip(cand, 0, npts - 1)
    cpts = vh.sorted_points[cand]                          # (N,M,W,3)
    diff = cpts - query[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cvalid & (d2 <= max_d2), d2, _INF)
    d2f = d2.reshape(n, m * window)
    candf = cand.reshape(n, m * window)
    if k == 1:
        best = jnp.argmin(d2f, axis=1)
        bd = jnp.take_along_axis(d2f, best[:, None], axis=1)
        bi = jnp.take_along_axis(candf, best[:, None], axis=1)
        return bd, bi, jnp.isfinite(bd) & qmask[:, None]
    negd, sel = jax.lax.top_k(-d2f, k)
    idx = jnp.take_along_axis(candf, sel, axis=1)
    d2k = -negd
    return d2k, idx, jnp.isfinite(d2k) & qmask[:, None]


def voxel_radius_count(vh: VoxelHash, query, qmask, radius, offsets,
                       window=8, exclude_self=True):
    """Count neighbors within ``radius`` among windowed voxel candidates.

    Approximate when cells hold more than ``window`` points (undercounts);
    exact otherwise with cell size >= radius and a 27-neighborhood.
    Queries are assumed to BE hash points when exclude_self (one self-match
    subtracted)."""
    slots, hit = voxel_lookup(vh, query, qmask, offsets=offsets)
    starts = vh.starts[slots]
    counts = vh.counts[slots].astype(jnp.int32)
    w = jnp.arange(window, dtype=jnp.int32)
    cand = starts[:, :, None] + w[None, None, :]
    cvalid = hit[:, :, None] & (w[None, None, :] < counts[:, :, None])
    npts = vh.sorted_points.shape[0]
    cand = jnp.clip(cand, 0, npts - 1)
    cpts = vh.sorted_points[cand]
    diff = cpts - query[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    inside = cvalid & (d2 <= radius * radius)
    n = jnp.sum(inside, axis=(1, 2)).astype(jnp.int32)
    if exclude_self:
        n = n - 1
    return jnp.where(qmask, jnp.maximum(n, 0), 0)


def voxel_knn_covariances(vh: VoxelHash, k, offsets, window=8,
                          mode="plane"):
    """Per-point neighborhood covariances over the hash's own points.

    fast_gicp's correspondence_randomness-kNN covariance, with candidates
    bounded to neighboring voxels. Operates on vh.sorted_points (the order
    the registration engine uses). Returns (covs (N,3,3), valid (N,)).
    """
    from .covariance_shim import regularize

    pts = vh.sorted_points
    msk = vh.sorted_valid
    d2, idx, valid = voxel_knn(vh, pts, msk, k, offsets, window)
    nb = pts[idx]                                   # (N,k,3)
    w = valid.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(nb * w[..., None], axis=1) / cnt[:, None]
    centered = (nb - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nka,nkb->nab", centered, centered) / cnt[:, None, None]
    cov = regularize(cov, mode)
    ok = msk & (jnp.sum(valid, axis=1) >= 3)
    return cov, ok
