"""Prefiltering stage: one fused device program per scan.

Reproduces PrefilteringNodelet::cloud_callback
(/root/reference/apps/prefiltering_nodelet.cpp:111-164):

  deskew -> base_link reframe (translation x/y zeroed, :141-142) ->
  distance filter -> voxel downsample -> outlier removal        -> 3-D out
  -> height filter -> normal filter (|n_z|<0.2, k=10) -> flatten -> 2-D out

Everything after host ingestion is a single jitted function over
fixed-capacity masked clouds; both outputs come back compacted.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    MaskedCloud,
    compact,
    deskew,
    distance_filter,
    flatten_z,
    height_filter,
    make_cloud,
    normal_filter,
    radius_outlier_removal,
    statistical_outlier_removal,
    transform_cloud,
    voxel_downsample,
)


@dataclasses.dataclass(frozen=True)
class PrefilteringConfig:
    downsample_method: str = "VOXELGRID"      # VOXELGRID | APPROX_VOXELGRID | NONE
    downsample_resolution: float = 0.1
    outlier_removal_method: str = "RADIUS"    # STATISTICAL | RADIUS | NONE
    statistical_mean_k: int = 20
    statistical_stddev: float = 1.0
    radius_radius: float = 0.8
    radius_min_neighbors: int = 2
    use_distance_filter: bool = True
    distance_near_thresh: float = 1.0
    distance_far_thresh: float = 100.0
    scan_period: float = 0.1
    deskewing: bool = False
    normal_filter_thresh: float = 0.2         # fixed in reference (:181, :238)
    normal_k: int = 10
    normal_radius: float = 0.75               # dense path: radius-search normals
    # capacities (static shapes)
    raw_capacity: int = 131072
    out_capacity: int = 32768
    chunk: int = 2048
    # neighbor search backend for the radius filter and normals:
    # 'dense' (exact radius stats via masked-moments matmuls — the MXU path),
    # 'voxel' (hash-bounded kNN candidates) or 'brute' (exact tiled kNN).
    # 'auto' resolves at stage build: dense on TPU (38 ms/frame vs 136 voxel
    # on v5e), voxel on CPU hosts where the 32k x 32k indicator matmuls of
    # the dense path are the bottleneck instead.
    neighbor_method: str = "auto"


class PrefilterOutput(NamedTuple):
    filtered3d: MaskedCloud
    filtered2d: MaskedCloud


def colored_by_order(points: np.ndarray) -> np.ndarray:
    """Debug colors encoding acquisition order (the reference's
    /colored_points deskew aid, prefiltering_nodelet.cpp:300-318):
    r = 255*t, g = 128, b = 255*(1-t). Returns (N,3) uint8."""
    n = max(len(points), 1)
    t = np.arange(len(points), dtype=np.float64) / n
    return np.stack(
        [255 * t, np.full(len(points), 128.0), 255 * (1 - t)], axis=1
    ).astype(np.uint8)


def _resolve_neighbor_method(cfg: PrefilteringConfig) -> PrefilteringConfig:
    if cfg.neighbor_method != "auto":
        return cfg
    method = "dense" if jax.default_backend() in ("tpu", "axon") else "voxel"
    return dataclasses.replace(cfg, neighbor_method=method)


def _build_fn(cfg: PrefilteringConfig):
    cfg = _resolve_neighbor_method(cfg)
    def run(cloud: MaskedCloud, base_T, lidar_height, ang_vel, use_deskew):
        if cfg.deskewing:
            skewed = deskew(cloud, ang_vel, cfg.scan_period)
            cloud = MaskedCloud(
                jnp.where(use_deskew, skewed.points, cloud.points), cloud.mask
            )
        cloud = transform_cloud(cloud, base_T)
        if cfg.use_distance_filter:
            cloud = distance_filter(
                cloud, cfg.distance_near_thresh, cfg.distance_far_thresh
            )
        if cfg.downsample_method in ("VOXELGRID", "APPROX_VOXELGRID"):
            # the downsample sorts by cell anyway: no pre-compaction needed
            c3 = voxel_downsample(
                cloud, cfg.downsample_resolution, capacity_out=cfg.out_capacity
            )
        else:
            # passthrough: compact then truncate to out_capacity
            cloud = compact(cloud)
            c3 = MaskedCloud(
                cloud.points[: cfg.out_capacity],
                cloud.mask[: cfg.out_capacity],
            )
        if cfg.outlier_removal_method == "STATISTICAL":
            c3 = statistical_outlier_removal(
                c3, cfg.statistical_mean_k, cfg.statistical_stddev,
                chunk=cfg.chunk,
            )
        elif cfg.outlier_removal_method == "RADIUS":
            c3 = radius_outlier_removal(
                c3, cfg.radius_radius, cfg.radius_min_neighbors,
                chunk=cfg.chunk, method=cfg.neighbor_method,
            )
        c3 = compact(c3)

        c2 = height_filter(c3, lidar_height)
        c2 = normal_filter(
            c2, cfg.normal_filter_thresh, cfg.normal_k,
            viewpoint=(0.0, 0.0, 0.0), keep_vertical_surfaces=True,
            chunk=cfg.chunk, method=cfg.neighbor_method,
            radius=cfg.normal_radius,
        )
        c2 = compact(flatten_z(c2))
        return PrefilterOutput(c3, c2)

    return run


import functools


@functools.lru_cache(maxsize=None)
def _jitted_fn(cfg):
    """Process-wide program cache keyed on the frozen config
    (new stage instances reuse the traced+compiled program)."""
    return jax.jit(_build_fn(cfg))


class PrefilteringStage:
    """Host facade. ``process(points, ...)`` -> PrefilterOutput.

    base_T: sensor->base_link transform; its x/y translation is zeroed to
    keep scans centered (prefiltering_nodelet.cpp:141-142) and its z
    becomes the lidar height used by the 2-D branch.
    """

    def __init__(self, cfg: PrefilteringConfig = PrefilteringConfig()):
        self.cfg = cfg
        self._fn = _jitted_fn(cfg)

    def process(
        self,
        points: np.ndarray,
        base_T: Optional[np.ndarray] = None,
        angular_velocity=None,
    ) -> PrefilterOutput:
        cfg = self.cfg
        n = len(points)
        if n > cfg.raw_capacity:
            points = points[: cfg.raw_capacity]
            n = cfg.raw_capacity
        cloud = make_cloud(points, capacity=cfg.raw_capacity)
        if base_T is None:
            base_T = np.eye(4)
        base_T = np.array(base_T, np.float32)
        lidar_height = float(base_T[2, 3])
        base_T[0, 3] = 0.0
        base_T[1, 3] = 0.0
        use_deskew = angular_velocity is not None
        ang = np.zeros(3, np.float32) if angular_velocity is None else np.asarray(
            angular_velocity, np.float32
        )
        return self._fn(
            cloud, jnp.asarray(base_T), lidar_height, jnp.asarray(ang),
            use_deskew,
        )
