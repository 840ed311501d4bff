"""Outlier-removal filters (pcl::StatisticalOutlierRemoval / RadiusOutlierRemoval).

Reference behavior (/root/reference/apps/prefiltering_nodelet.cpp:77-98,
:262-273):

- STATISTICAL(mean_k, stddev_mul): mean euclidean distance to the mean_k
  nearest neighbors (excluding self); keep points whose mean distance is
  below global_mean + stddev_mul * global_std.
- RADIUS(radius, min_neighbors): keep points with at least min_neighbors
  other points within radius.
"""

import jax.numpy as jnp

from .cloud import MaskedCloud
from .knn import knn, radius_count


def statistical_outlier_removal(
    cloud: MaskedCloud, mean_k: int = 20, stddev_mul: float = 1.0, *, chunk=1024
) -> MaskedCloud:
    d2, _ = knn(
        cloud.points, cloud.mask, cloud.points, cloud.mask,
        k=mean_k, exclude_self=True, chunk=chunk,
    )
    # mean over the k neighbor euclidean distances (inf -> missing neighbor)
    finite = jnp.isfinite(d2)
    d = jnp.sqrt(jnp.where(finite, d2, 0.0))
    cnt = jnp.maximum(jnp.sum(finite, axis=1), 1)
    mean_d = jnp.sum(d, axis=1) / cnt

    nvalid = jnp.maximum(jnp.sum(cloud.mask), 1)
    mu = jnp.sum(jnp.where(cloud.mask, mean_d, 0.0)) / nvalid
    var = jnp.sum(jnp.where(cloud.mask, (mean_d - mu) ** 2, 0.0)) / nvalid
    thresh = mu + stddev_mul * jnp.sqrt(var)
    keep = cloud.mask & (mean_d <= thresh)
    return MaskedCloud(cloud.points, keep)


def radius_outlier_removal(
    cloud: MaskedCloud, radius: float = 0.8, min_neighbors: int = 2, *,
    chunk=2048, method="brute", voxel_window=16,
) -> MaskedCloud:
    """method='dense' (the TPU default) computes exact PCL RadiusSearch
    counts through the masked-moments matmul pass (ops/moments.py) — no
    gathers, no cell-capacity truncation. method='voxel' counts neighbors
    among windowed hash candidates (cell size = radius, 27-neighborhood):
    exact unless a cell holds more than ``voxel_window`` points, in which
    case it may undercount — for an outlier filter (keep when count >= 2)
    that direction is harmless."""
    if method == "dense":
        from .moments import radius_moments

        mom = radius_moments(cloud, cloud, radius, chunk=min(4096, cloud.capacity))
        keep = cloud.mask & ((mom.count - 1) >= min_neighbors)
        return MaskedCloud(cloud.points, keep)
    if method == "voxel":
        import numpy as _np

        from .voxel import build_voxel_hash
        from .voxel_knn import voxel_radius_count

        vh = build_voxel_hash(cloud, radius, cloud.capacity,
                              dense_index=True, with_stats=False)
        offs = _np.asarray(
            [[i, j, l] for i in (-1, 0, 1) for j in (-1, 0, 1)
             for l in (-1, 0, 1)], _np.int32,
        )
        cnt = voxel_radius_count(vh, cloud.points, cloud.mask, radius, offs,
                                 window=voxel_window)
    else:
        cnt = radius_count(cloud.points, cloud.mask, radius, chunk=chunk)
    keep = cloud.mask & (cnt >= min_neighbors)
    return MaskedCloud(cloud.points, keep)
