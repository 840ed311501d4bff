"""Floor-plane detection stage.

Reproduces FloorDetectionNodelet::detect
(/root/reference/apps/floor_detection_nodelet.cpp:110-180):

  tilt compensation (rotate by tilt_deg about Y) -> height clip to
  [sensor_height - clip, sensor_height + clip] -> optional normal filter
  (|n.z| > cos(normal_filter_thresh deg), viewpoint (0,0,sensor_height))
  -> many-hypothesis RANSAC plane (thresh 0.1) -> support-count gate
  (floor_pts_thresh) -> verticality gate (floor_normal_thresh deg) ->
  normal sign made upward.

Returns the plane coefficients (a,b,c,d) in the *untilted* sensor frame or
None — the FloorCoeffs contract.
"""

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import (
    MaskedCloud,
    compact,
    make_cloud,
    plane_clip,
    ransac_plane,
)
from ..ops.normals import estimate_normals
from ..ops.ransac import refine_plane


@dataclasses.dataclass(frozen=True)
class FloorDetectionConfig:
    tilt_deg: float = 0.0
    sensor_height: float = 2.0
    height_clip_range: float = 1.0
    floor_pts_thresh: int = 512
    floor_normal_thresh: float = 10.0     # degrees
    use_normal_filtering: bool = True
    normal_filter_thresh: float = 20.0    # degrees
    ransac_dist_thresh: float = 0.1       # fixed in reference (:140)
    n_hypotheses: int = 512
    capacity: int = 32768
    chunk: int = 2048
    # static capacity of the height-clipped band the normal filter +
    # RANSAC run on. The clip keeps only points within +-clip_range of
    # the floor (a few thousand of a 16-32k scan), but without a
    # re-pack the kNN normals pass still pays the FULL input capacity —
    # measured 265 ms/frame in the hdl e2e, the pipeline's max stage.
    # Overflow beyond this capacity drops the (stable-order) tail;
    # 0 disables the truncation.
    clip_capacity: int = 8192
    # neighbor source for the normal filter: auto = the masked-moments
    # dense radius path on TPU (the same choice PrefilteringConfig
    # makes; no serialized gathers), exact brute kNN elsewhere
    neighbor_method: str = "auto"         # auto | brute | voxel | dense
    normal_radius: float = 0.75


def _build_fn(cfg: FloorDetectionConfig):
    def run(cloud: MaskedCloud, key):
        t = np.deg2rad(cfg.tilt_deg)
        ct, st = np.cos(t), np.sin(t)
        tilt = jnp.asarray(
            [[ct, 0, st, 0], [0, 1, 0, 0], [-st, 0, ct, 0], [0, 0, 0, 1]],
            cloud.points.dtype,
        )
        pts = cloud.points @ tilt[:3, :3].T
        c = MaskedCloud(pts, cloud.mask)
        # keep the band -(h+clip) < z < -(h-clip) (floor_detection:118-119)
        c = plane_clip(
            c, jnp.asarray([0.0, 0.0, 1.0, cfg.sensor_height + cfg.height_clip_range]),
            negative=False,
        )
        c = plane_clip(
            c, jnp.asarray([0.0, 0.0, 1.0, cfg.sensor_height - cfg.height_clip_range]),
            negative=True,
        )
        # re-pack the clipped band to its own (small) static capacity:
        # every downstream pass (normals, RANSAC) then costs O(band)
        # instead of O(full scan capacity)
        c = compact(c)
        if cfg.clip_capacity and cfg.clip_capacity < c.points.shape[0]:
            c = MaskedCloud(c.points[: cfg.clip_capacity],
                            c.mask[: cfg.clip_capacity])
        if cfg.use_normal_filtering:
            method = cfg.neighbor_method
            if method == "auto":
                method = ("dense" if jax.default_backend() in ("tpu", "axon")
                          else "brute")
            n, valid = estimate_normals(
                c, k=10, viewpoint=(0.0, 0.0, cfg.sensor_height),
                chunk=cfg.chunk, method=method, radius=cfg.normal_radius,
            )
            keep = jnp.abs(n[:, 2]) > np.cos(np.deg2rad(cfg.normal_filter_thresh))
            c = MaskedCloud(c.points, c.mask & valid & keep)
        c = compact(c)
        n_filtered = jnp.sum(c.mask)

        res = ransac_plane(
            c, key, n_hypotheses=cfg.n_hypotheses,
            dist_thresh=cfg.ransac_dist_thresh,
            min_inliers=cfg.floor_pts_thresh,
        )
        coeffs = refine_plane(c.points, res.inliers, res.coeffs)

        # verticality check vs the tilted up-axis (:152-161)
        ref = tilt[:3, :3].T @ jnp.asarray([0.0, 0.0, 1.0], coeffs.dtype)
        dot = jnp.abs(jnp.sum(coeffs[:3] * ref))
        vertical_ok = dot > np.cos(np.deg2rad(cfg.floor_normal_thresh))
        ok = (
            (n_filtered >= cfg.floor_pts_thresh)
            & (res.n_inliers >= cfg.floor_pts_thresh)
            & vertical_ok
        )
        # make the normal upward (:164-166)
        coeffs = jnp.where(coeffs[2] < 0, -coeffs, coeffs)
        # de-tilt the plane back to the sensor frame
        n_out = tilt[:3, :3].T @ coeffs[:3]
        coeffs_out = jnp.concatenate([n_out, coeffs[3:]])
        return coeffs_out, ok, res.n_inliers

    return run


import functools


@functools.lru_cache(maxsize=None)
def _jitted_fn(cfg):
    """Process-wide program cache keyed on the frozen config
    (new stage instances reuse the traced+compiled program)."""
    return jax.jit(_build_fn(cfg))


class FloorDetectionStage:
    def __init__(self, cfg: FloorDetectionConfig = FloorDetectionConfig()):
        self.cfg = cfg
        self._fn = _jitted_fn(cfg)
        self._key = jax.random.PRNGKey(42)

    def detect(self, cloud) -> Optional[np.ndarray]:
        """cloud: MaskedCloud or (N,3) array. Returns coeffs (4,) or None."""
        if not isinstance(cloud, MaskedCloud):
            cloud = make_cloud(np.asarray(cloud), capacity=self.cfg.capacity)
        self._key, sub = jax.random.split(self._key)
        coeffs, ok, _ = self._fn(cloud, sub)
        if not bool(ok):
            return None
        return np.asarray(coeffs)
