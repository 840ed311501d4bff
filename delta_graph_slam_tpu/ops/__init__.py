"""Point-cloud compute kernels (JAX/XLA/Pallas).

TPU-native replacements for the PCL primitives used by the reference
(prefiltering, normal estimation, SAC segmentation, clustering, octree):
fixed-capacity masked clouds, scatter/segment-reduce voxel ops, tiled
brute-force / voxel-hash neighbor search, many-hypothesis RANSAC.
"""

from .cloud import (
    MaskedCloud,
    make_cloud,
    compact,
    distance_filter,
    height_filter,
    flatten_z,
    plane_clip,
    deskew,
    transform_cloud,
)
from .voxel import (
    voxel_keys,
    voxel_downsample,
    occupied_voxel_centers,
    VoxelHash,
    build_voxel_hash,
    voxel_lookup,
)
from .knn import nn_1, knn, radius_count
from .moments import morton_keys, radius_moments, RadiusMoments
from .voxel_knn import voxel_nn, voxel_knn, voxel_knn_covariances, voxel_radius_count
from .pallas_nn import nn_1_auto, nn_1_pallas
from .outliers import radius_outlier_removal, statistical_outlier_removal
from .normals import estimate_normals, normal_filter
from .ransac import ransac_plane, ransac_line, euclidean_cluster_mask

__all__ = [
    "MaskedCloud", "make_cloud", "compact", "distance_filter", "height_filter",
    "flatten_z", "plane_clip", "deskew", "transform_cloud",
    "voxel_keys", "voxel_downsample", "occupied_voxel_centers",
    "VoxelHash", "build_voxel_hash", "voxel_lookup",
    "nn_1", "knn", "radius_count",
    "morton_keys", "radius_moments", "RadiusMoments",
    "voxel_nn", "voxel_knn", "voxel_knn_covariances", "voxel_radius_count",
    "nn_1_auto", "nn_1_pallas",
    "radius_outlier_removal", "statistical_outlier_removal",
    "estimate_normals", "normal_filter",
    "ransac_plane", "ransac_line", "euclidean_cluster_mask",
]
