"""Stage-level tests: prefiltering, odometry, floor detection."""

import dataclasses

import numpy as np
import pytest

from delta_graph_slam_tpu.models import (
    FloorDetectionConfig, FloorDetectionStage,
    OdometryConfig, PrefilteringConfig, PrefilteringStage,
    ScanMatchingOdometry,
)
from delta_graph_slam_tpu.register import RegistrationConfig

RNG = np.random.default_rng(9)


def city_scan(n=4000, seed=0, sensor_height=1.8):
    rng = np.random.default_rng(seed)
    ground = np.stack([
        rng.uniform(-40, 40, n // 2), rng.uniform(-40, 40, n // 2),
        np.full(n // 2, -sensor_height),
    ], 1)
    wall = np.stack([
        rng.uniform(-40, 40, n - n // 2), np.full(n - n // 2, 12.0),
        rng.uniform(-sensor_height, 4.0, n - n // 2),
    ], 1)
    return (np.concatenate([ground, wall])
            + rng.normal(0, 0.01, (n, 3))).astype(np.float32)


class TestPrefiltering:
    def test_two_outputs(self):
        cfg = PrefilteringConfig(
            raw_capacity=4096, out_capacity=2048, chunk=512,
            distance_near_thresh=0.5, distance_far_thresh=60.0,
            downsample_resolution=0.3, outlier_removal_method="RADIUS",
            radius_radius=1.0, radius_min_neighbors=2,
        )
        stage = PrefilteringStage(cfg)
        scan = city_scan()
        out = stage.process(scan, base_T=np.eye(4))
        n3 = int(np.asarray(out.filtered3d.mask).sum())
        n2 = int(np.asarray(out.filtered2d.mask).sum())
        assert 100 < n3 <= 2048
        assert 0 < n2 < n3
        # 2-D branch: flattened and above-lidar only, near-vertical surfaces
        pts2 = np.asarray(out.filtered2d.points)[np.asarray(out.filtered2d.mask)]
        assert np.all(pts2[:, 2] == 0.0)
        # wall points dominate the 2-D branch (the ground is filtered out)
        assert np.mean(np.abs(pts2[:, 1] - 12.0) < 1.0) > 0.8

    def test_distance_filter_applied(self):
        cfg = PrefilteringConfig(
            raw_capacity=2048, out_capacity=1024, chunk=512,
            distance_near_thresh=5.0, distance_far_thresh=30.0,
            downsample_method="NONE", outlier_removal_method="NONE",
        )
        stage = PrefilteringStage(cfg)
        scan = city_scan(n=2000, seed=1)
        out = stage.process(scan)
        pts = np.asarray(out.filtered3d.points)[np.asarray(out.filtered3d.mask)]
        d = np.linalg.norm(pts, axis=1)
        assert d.min() > 5.0 - 1e-3
        assert d.max() < 30.0 + 1e-3


class TestOdometry:
    def test_tracks_motion(self):
        from delta_graph_slam_tpu.ops import make_cloud

        cfg = OdometryConfig(
            registration=RegistrationConfig(
                method="FAST_GICP", maximum_iterations=30, chunk=512,
                correspondence_randomness=10, transformation_epsilon=1e-4,
            ),
            keyframe_delta_trans=5.0, keyframe_delta_angle=5.0,
            keyframe_delta_time=10000.0,
        )
        odo = ScanMatchingOdometry(cfg)
        base = city_scan(n=1500, seed=2)
        # frames moving +0.5 m/frame in x
        for k in range(4):
            pts = base - np.float32([0.5 * k, 0.0, 0.0])
            frame = odo.matching(0.1 * k, make_cloud(pts, capacity=1536))
        # sensor moved forward: odometry x ~ +1.5 after 3 steps
        np.testing.assert_allclose(frame.pose[0, 3], 1.5, atol=0.1)
        assert frame.converged
        assert frame.inlier_fraction > 0.8

    def test_rejection_reuses_motion(self):
        from delta_graph_slam_tpu.ops import make_cloud

        cfg = OdometryConfig(
            registration=RegistrationConfig(
                method="FAST_GICP", maximum_iterations=20, chunk=512,
                correspondence_randomness=10,
            ),
            transform_thresholding=True,
            max_acceptable_trans=0.2, max_acceptable_angle=0.2,
            keyframe_delta_trans=100.0, keyframe_delta_angle=100.0,
            keyframe_delta_time=1e9,
        )
        odo = ScanMatchingOdometry(cfg)
        base = city_scan(n=1200, seed=3)
        odo.matching(0.0, make_cloud(base, capacity=1280))
        # a 2 m jump exceeds max_acceptable_trans -> frame rejected
        frame = odo.matching(0.1, make_cloud(base - np.float32([2.0, 0, 0]),
                                             capacity=1280))
        assert frame.rejected
        np.testing.assert_allclose(frame.pose, np.eye(4), atol=1e-6)


class TestFloorDetection:
    def test_detects_floor(self):
        cfg = FloorDetectionConfig(
            sensor_height=1.8, height_clip_range=1.0, floor_pts_thresh=200,
            capacity=4096, chunk=512, n_hypotheses=256,
        )
        stage = FloorDetectionStage(cfg)
        coeffs = stage.detect(city_scan(n=3000, seed=4))
        assert coeffs is not None
        # floor at z = -1.8 in sensor frame: n ~ +z, d ~ 1.8
        np.testing.assert_allclose(abs(coeffs[2]), 1.0, atol=0.02)
        np.testing.assert_allclose(coeffs[3], 1.8, atol=0.1)

    def test_no_floor_returns_none(self):
        cfg = FloorDetectionConfig(
            sensor_height=1.8, floor_pts_thresh=200, capacity=2048,
            chunk=512,
        )
        stage = FloorDetectionStage(cfg)
        # vertical wall only -> no horizontal plane support
        rng = np.random.default_rng(5)
        wall = np.stack([
            rng.uniform(-20, 20, 1500), np.full(1500, 8.0),
            rng.uniform(-1.5, 3.0, 1500),
        ], 1).astype(np.float32)
        assert stage.detect(wall) is None


class TestParallelSharding:
    def test_dryrun_multichip(self):
        import jax

        assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import jax
        import __graft_entry__ as ge

        fn, args = ge.entry()
        res = jax.jit(fn)(*args)
        T = np.asarray(res.transformation)
        assert T.shape == (4, 4)
        assert np.isfinite(T).all()


class TestMultiBag:
    def test_lockstep_odometry(self):
        from delta_graph_slam_tpu.ops import make_cloud
        from delta_graph_slam_tpu.parallel import MultiBagOdometry
        from delta_graph_slam_tpu.register import RegistrationConfig

        cfg = RegistrationConfig(
            method="FAST_GICP", maximum_iterations=20, chunk=512,
            correspondence_randomness=10, transformation_epsilon=1e-4,
        )
        B = 3
        mb = MultiBagOdometry(cfg, B, keyframe_delta_trans=5.0,
                              keyframe_delta_angle=5.0)
        bases = [city_scan(n=1200, seed=s) for s in range(B)]
        speeds = [0.3, 0.5, 0.7]
        odom = None
        for k in range(4):
            clouds = [
                make_cloud(bases[b] - np.float32([speeds[b] * k, 0, 0]),
                           capacity=1280)
                for b in range(B)
            ]
            odom = mb.process(clouds)
        for b in range(B):
            np.testing.assert_allclose(
                odom[b][0, 3], speeds[b] * 3, atol=0.1,
                err_msg=f"bag {b}",
            )
